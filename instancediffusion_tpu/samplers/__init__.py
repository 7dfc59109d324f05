"""instancediffusion_tpu.samplers"""
