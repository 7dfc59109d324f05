"""instancediffusion_tpu.nn"""
