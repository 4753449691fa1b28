"""torch <-> jax checkpoint conversion roundtrip.

The export path (io/torch_convert.py torch_state_dict_from_params) must be
the exact inverse of the import path so a TPU-trained model ships back to
the torch ecosystem losslessly (reference save format:
base_model.py:193-224)."""

import numpy as np
import pytest

from tests.reference_oracle import (build_reference_model,
                                    reference_available, tiny_opt)
from turtlevsr_tpu.io.torch_convert import (params_from_torch_state_dict,
                                            save_torch_checkpoint,
                                            torch_state_dict_from_params)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _roundtrip_check(sd):
    params = params_from_torch_state_dict(sd)
    back = torch_state_dict_from_params(params)
    ref = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    assert set(back) == set(ref)
    for k in ref:
        assert back[k].shape == ref[k].shape, k
        np.testing.assert_array_equal(back[k], ref[k].astype(np.float32),
                                      err_msg=k)


def test_roundtrip_bitwise_t1():
    model = build_reference_model(tiny_opt("Turtle_t1_arch"), dtype="float32")
    _roundtrip_check(model.state_dict())


def test_pth_file_roundtrip(tmp_path):
    import torch

    model = build_reference_model(tiny_opt("Turtle_arch"), dtype="float32")
    sd = model.state_dict()
    params = params_from_torch_state_dict(sd)
    path = str(tmp_path / "net_g.pth")
    save_torch_checkpoint(path, params)

    blob = torch.load(path, map_location="cpu", weights_only=True)
    assert set(blob) == {"params"}
    # the exported .pth must load into the torch reference strictly
    result = model.load_state_dict(blob["params"], strict=True)
    assert not result.missing_keys and not result.unexpected_keys
    for k, v in blob["params"].items():
        np.testing.assert_array_equal(
            v.numpy(), sd[k].detach().cpu().numpy().astype(np.float32),
            err_msg=k)
