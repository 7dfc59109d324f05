"""instancediffusion_tpu.evalsuite"""
