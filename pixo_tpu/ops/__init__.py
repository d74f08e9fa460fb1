"""Device (JAX/Pallas) kernels: the TPU analog of pixo's SIMD tier."""
