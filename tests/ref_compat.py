"""Helpers to import the PyTorch reference (read-only at /root/reference) for
golden parity tests. The reference needs `timm` (absent) and tries to
download ConvNeXt zoo weights; both are stubbed here. Used ONLY by tests —
the production framework never imports the reference."""

import sys
import types

REF_PATH = "/root/reference"


def load_ref_function(relpath: str, name: str, extra_globals: dict | None = None):
    """Extract a single top-level function from a reference file by AST,
    avoiding that module's (heavy/missing) import chain."""
    import ast

    with open(f"{REF_PATH}/{relpath}") as f:
        tree = ast.parse(f.read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            mod = ast.Module(body=[node], type_ignores=[])
            ns: dict = {"__builtins__": __builtins__}
            import numpy as np
            import torch

            ns.update({"np": np, "numpy": np, "torch": torch})
            if extra_globals:
                ns.update(extra_globals)
            exec(compile(mod, f"{REF_PATH}/{relpath}", "exec"), ns)
            return ns[name]
    raise KeyError(f"{name} not found in {relpath}")


def install_reference():
    import torch
    import torch.nn as tnn

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_registry = types.ModuleType("timm.models.registry")

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        class DropPath(tnn.Identity):
            def __init__(self, drop_prob=0.0):
                super().__init__()

        timm_layers.trunc_normal_ = trunc_normal_
        timm_layers.DropPath = DropPath
        timm_registry.register_model = lambda f: f
        timm.models = timm_models
        timm_models.layers = timm_layers
        timm_models.registry = timm_registry
        for name, mod in (
            ("timm", timm), ("timm.models", timm_models),
            ("timm.models.layers", timm_layers),
            ("timm.models.registry", timm_registry),
        ):
            # a real __spec__ keeps importlib.util.find_spec() (used by
            # transformers' optional-dependency probing) from raising
            import importlib.machinery

            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class _OmegaConf:
            @staticmethod
            def load(path):
                import yaml

                with open(path) as f:
                    return yaml.safe_load(f)

            @staticmethod
            def create(d):
                return d

            @staticmethod
            def to_container(d):
                return d

        oc.OmegaConf = _OmegaConf
        sys.modules["omegaconf"] = oc

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.save_image = lambda *a, **k: None
        tv_utils.make_grid = lambda *a, **k: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils

    # Block the ConvNeXt pretrained-weight download (no egress):
    # load_state_dict(..., strict=False) with an empty dict is a no-op.
    torch.hub.load_state_dict_from_url = lambda *a, **k: {"model": {}}
