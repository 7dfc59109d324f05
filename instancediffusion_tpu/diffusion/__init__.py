"""instancediffusion_tpu.diffusion"""
