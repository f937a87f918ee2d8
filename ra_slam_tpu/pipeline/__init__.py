from ra_slam_tpu.pipeline.system import RaSlamSystem

__all__ = ["RaSlamSystem"]
