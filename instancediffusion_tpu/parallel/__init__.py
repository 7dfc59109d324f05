"""instancediffusion_tpu.parallel"""
