"""Helpers to import the read-only PyTorch reference for golden parity tests.

The reference lives at /root/reference and needs torchvision only at import
time of two loss modules we never construct in tests — stub it.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def import_reference():
    """Make `modeling.*` / `evaluator.*` from the reference importable."""
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
    if "torch_fidelity" not in sys.modules:
        # torch-fidelity is not installed; the reference's metrics/inception.py
        # imports it at module load (evaluator/evaluator.py pulls it in even
        # when rFID/IS are disabled). Stub just enough for import — tests
        # never construct the Inception extractor (no weights, no network).
        import torch

        tf_mod = types.ModuleType("torch_fidelity")
        feb = types.ModuleType("torch_fidelity.feature_extractor_base")

        class FeatureExtractorBase(torch.nn.Module):
            def __init__(self, name, features_list):
                super().__init__()
                self.name = name
                self.features_list = list(features_list)

        feb.FeatureExtractorBase = FeatureExtractorBase
        helpers = types.ModuleType("torch_fidelity.helpers")
        helpers.vassert = lambda cond, msg="": None
        fi3 = types.ModuleType("torch_fidelity.feature_extractor_inceptionv3")
        for cls_name in ("BasicConv2d", "InceptionA", "InceptionB", "InceptionC",
                         "InceptionD", "InceptionE_1", "InceptionE_2"):
            setattr(fi3, cls_name, type(cls_name, (torch.nn.Module,), {}))
        ict = types.ModuleType("torch_fidelity.interpolate_compat_tensorflow")
        ict.interpolate_bilinear_2d_like_tensorflow1x = None  # never called
        tf_mod.feature_extractor_base = feb
        tf_mod.helpers = helpers
        tf_mod.feature_extractor_inceptionv3 = fi3
        tf_mod.interpolate_compat_tensorflow = ict
        sys.modules["torch_fidelity"] = tf_mod
        sys.modules["torch_fidelity.feature_extractor_base"] = feb
        sys.modules["torch_fidelity.helpers"] = helpers
        sys.modules["torch_fidelity.feature_extractor_inceptionv3"] = fi3
        sys.modules["torch_fidelity.interpolate_compat_tensorflow"] = ict


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
