"""instancediffusion_tpu.ops"""
