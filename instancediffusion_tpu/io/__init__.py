"""instancediffusion_tpu.io"""
