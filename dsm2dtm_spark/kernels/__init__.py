"""Pure-numpy raster kernels (scipy.ndimage-compatible, reimplemented from
scratch — scipy is not available in the target environment, SURVEY.md §7.0)."""

from dsm2dtm_spark.kernels.edt import edt_with_indices, fill_nearest, nearest_valid
from dsm2dtm_spark.kernels.gaussian import gaussian_filter2d, gaussian_kernel1d
from dsm2dtm_spark.kernels.morphology import dilate_square, erode_square, grey_opening_square
from dsm2dtm_spark.kernels.padding import pad_reflect, reflect_indices
from dsm2dtm_spark.kernels.zoom import zoom_bilinear, zoom_output_shape

__all__ = [
    "edt_with_indices",
    "fill_nearest",
    "nearest_valid",
    "gaussian_filter2d",
    "gaussian_kernel1d",
    "grey_opening_square",
    "erode_square",
    "dilate_square",
    "pad_reflect",
    "reflect_indices",
    "zoom_bilinear",
    "zoom_output_shape",
]
