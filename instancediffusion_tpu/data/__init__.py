"""instancediffusion_tpu.data"""
