"""instancediffusion_tpu.kernels"""
