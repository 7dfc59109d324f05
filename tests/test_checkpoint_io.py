"""Checkpoint file loading: torch-pickle and safetensors forms, bf16
upcast. The reference reads only torch pickles
(/root/reference/utils/checkpoint.py:13); HF ships SD1.5/SDXL-refiner
weights as .safetensors today, so the converter accepts both."""

import numpy as np
import torch

from instancediffusion_tpu.io.torch_convert import load_torch_checkpoint


def _sd():
    return {
        "model.diffusion_model.w": torch.arange(6, dtype=torch.float32).reshape(2, 3),
        "half": torch.full((4,), 1.5, dtype=torch.float16),
        "bf16": torch.full((3,), 2.0, dtype=torch.bfloat16),
    }


def test_load_torch_pickle(tmp_path):
    p = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": _sd()}, p)
    out = load_torch_checkpoint(p)
    assert out["model.diffusion_model.w"].shape == (2, 3)
    assert out["half"].dtype == np.float16
    # bf16 upcasts to f32 (numpy has no bfloat16)
    assert out["bf16"].dtype == np.float32
    np.testing.assert_array_equal(out["bf16"], np.full((3,), 2.0, np.float32))


def test_load_safetensors(tmp_path):
    from safetensors import torch as safetorch

    p = str(tmp_path / "ckpt.safetensors")
    safetorch.save_file(_sd(), p)
    out = load_torch_checkpoint(p)
    ref = _sd()
    np.testing.assert_array_equal(
        out["model.diffusion_model.w"],
        ref["model.diffusion_model.w"].numpy(),
    )
    assert out["half"].dtype == np.float16
    assert out["bf16"].dtype == np.float32
