"""instancediffusion_tpu.models"""
