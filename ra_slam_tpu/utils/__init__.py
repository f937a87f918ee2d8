from ra_slam_tpu.utils.pose_buffer import PoseBuffer

__all__ = ["PoseBuffer"]
