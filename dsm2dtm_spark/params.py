"""Pipeline constants and per-resolution parameter derivation.

Semantics pinned to the reference (citations into /root/reference/):
constants.py:6-33 for the defaults; algorithm.py:114-162 for the adaptive
derivation; algorithm.py:390-402 for the kernel-radius override. Written from
scratch; only the published behavior is reproduced.
"""

from __future__ import annotations

from dataclasses import dataclass

# reference constants.py:6
NODATA_DEFAULT = -99999.0
# reference constants.py:12-16
PMF_INIT_WINDOW_M = 3.0
PMF_MAX_WINDOW_M = 161.0
PMF_BASE_SLOPE = 0.05
PMF_INIT_THRESHOLD = 0.1
PMF_MAX_THRESHOLD = 20.0
# reference constants.py:19-21
REFINE_SIGMA_M = 5.0
REFINE_ELEV_THRESHOLD = 1.0
FINAL_SIGMA_M = 0.5
# reference constants.py:26
MIN_PROCESS_RES_M = 0.5
# reference constants.py:29-30
GAP_FILL_MAX_DIST_M = 100.0
# reference constants.py:33
DEFAULT_RADIUS_M = 40.0
# degrees→meters equator fallback, reference algorithm.py:393
DEG_TO_M = 111320.0
# hard kernel safety cap, reference qgis_plugin processing_algorithm.py:19,
# 219-225: a radius/resolution combination that derives a window beyond this
# is a config error (it would also derive a multi-GB tiled halo) — fail fast
MAX_WINDOW_PX = 5000
# halo bound implied by the window cap: Σ(wᵢ−1) over the geometric schedule
# ≈ 2·max_window, plus Gaussian radii and gap-fill distance — 3× leaves room
MAX_HALO_PX = 3 * MAX_WINDOW_PX


def _check_window_cap(window_px: int, context: str) -> None:
    if window_px > MAX_WINDOW_PX:
        raise ValueError(
            f"{context} would build a {window_px}-pixel kernel — exceeds the "
            f"safety cap of {MAX_WINDOW_PX} px (reference "
            "processing_algorithm.py:219-225). Reduce the radius or downsample first."
        )


@dataclass
class DerivedParams:
    """Resolution-adapted parameters (reference AdaptiveParameters, algorithm.py:42-51)."""

    init_window: int
    max_window: int
    slope_px: float
    refine_sigma: float
    final_sigma: float
    gap_dist_px: float


def _force_odd_down(v: int) -> int:
    return v - 1 if v % 2 == 0 else v


def derive_params(resolution: float, max_image_dim: int = 10000, base_slope: float = PMF_BASE_SLOPE) -> DerivedParams:
    """Scale windows/sigmas/search distances from meters to pixels.

    Mirrors reference algorithm.py:114-162: initial window forced odd upward
    and floored at 3; max window capped by the (odd-floored) largest image
    dimension and forced odd downward, never below the initial window.
    """
    res = max(resolution, 0.001)
    init_w = int(PMF_INIT_WINDOW_M / res)
    if init_w % 2 == 0:
        init_w += 1
    init_w = max(3, init_w)
    max_w = min(int(PMF_MAX_WINDOW_M / res), _force_odd_down(max_image_dim))
    max_w = _force_odd_down(max_w)
    max_w = max(init_w, max_w)
    # cap AFTER the image-dim clamp: the reference library itself never
    # derives beyond the image (tiny fine-res chips are legal, reference
    # algorithm.py:292-296 guard); what must fail fast is a genuinely huge
    # image × fine resolution, where the clamp no longer saves us
    _check_window_cap(max_w, f"adaptive max window at resolution {res:.4f}m")
    return DerivedParams(
        init_window=init_w,
        max_window=max_w,
        slope_px=base_slope * res,
        refine_sigma=REFINE_SIGMA_M / res,
        final_sigma=FINAL_SIGMA_M / res,
        gap_dist_px=GAP_FILL_MAX_DIST_M / res,
    )


def apply_radius_override(params: DerivedParams, radius_m: float, cell_size: float, max_image_dim: int) -> None:
    """Replace the max PMF window with one derived from a user radius in meters.

    Mirrors reference algorithm.py:390-402, including the degrees→meters
    fallback for unprojected inputs (cell sizes < 0.01 treated as degrees).
    """
    res_m = cell_size * DEG_TO_M if cell_size < 0.01 else cell_size
    res_m = max(res_m, 0.001)
    w = int(radius_m / res_m) * 2 + 1
    w = min(w, _force_odd_down(max_image_dim))
    # hard cap AFTER the image-dim clamp: the reference library lets tiny
    # fine-res chips clamp down legally (its own 1 cm stress test relies on
    # it); the hazard the plugin cap exists for — a kernel/halo that's huge
    # in absolute pixels — requires a huge image too
    _check_window_cap(w, f"radius {radius_m}m at resolution {res_m:.4f}m")
    params.max_window = max(w, params.init_window)


def pmf_window_schedule(init_window: int, max_window: int) -> list[int]:
    """The geometric w→2w−1 window growth actually executed by the PMF loop
    (reference algorithm.py:200-215). Used for halo sizing in the tiled path."""
    out = []
    w = init_window
    while w <= max_window:
        out.append(w)
        w = 2 * w - 1
    return out


def total_influence_px(params: DerivedParams) -> int:
    """Upper bound on how far (in px, Chebyshev) one input pixel can influence
    the final DTM: Σ(wᵢ−1) over executed openings, plus the two Gaussian radii
    (int(4σ+0.5) each), plus the gap-fill gather distance. Drives halo sizing
    (SURVEY.md §7.2 item 2)."""
    open_r = sum(w - 1 for w in pmf_window_schedule(params.init_window, params.max_window))
    g1 = int(4.0 * params.refine_sigma + 0.5)
    g2 = int(4.0 * params.final_sigma + 0.5)
    import math

    return int(open_r + g1 + g2 + math.ceil(params.gap_dist_px))
