"""TPU-side numerical ops: metrics, threshold calibration, resize, Pallas kernels."""
