from ra_slam_tpu.slam.pnp import (
    PnPResult,
    motion_only_gn,
    reprojection_residuals,
)

__all__ = [
    "PnPResult",
    "motion_only_gn",
    "reprojection_residuals",
]
