"""instancediffusion_tpu.train"""
