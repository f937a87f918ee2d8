from ra_slam_tpu.ops.hamming import hamming_matrix_pallas

__all__ = ["hamming_matrix_pallas"]
