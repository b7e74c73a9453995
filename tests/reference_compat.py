"""Helpers to import the read-only PyTorch reference for golden parity tests.

The reference lives at /root/reference and needs torchvision only at import
time of two loss modules we never construct in tests — stub it.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def import_reference():
    """Make `modeling.*` from the reference importable; returns nothing."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_fx = types.ModuleType("torchvision.models.feature_extraction")
        tv_fx.create_feature_extractor = lambda *a, **k: None
        tv_models.feature_extraction = tv_fx
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models.feature_extraction"] = tv_fx


class AttrDict(dict):
    """Minimal stand-in for the reference's OmegaConf nodes in constructors."""

    def __getattr__(self, key):
        try:
            value = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return AttrDict(value) if isinstance(value, dict) else value

    def get(self, key, default=None):
        value = super().get(key, default)
        return AttrDict(value) if isinstance(value, dict) else value


def torch_state_numpy(module):
    """state_dict as {key: numpy} (torch imported lazily)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
