"""instancediffusion_tpu.utils"""
