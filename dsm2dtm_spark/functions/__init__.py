"""Scalar/column function library (SURVEY.md E14) and text-analysis functions
for training-data pipelines."""
