"""Load the PyTorch reference (read-only, /root/reference) as a golden
oracle for parity tests. The reference code is executed, never copied."""

import functools
import importlib.util
import os
import sys

REFERENCE_ROOT = os.environ.get("TURTLE_REFERENCE", "/root/reference")
ARCH_DIR = os.path.join(REFERENCE_ROOT, "basicsr", "models", "archs")


def reference_available() -> bool:
    return os.path.isdir(ARCH_DIR)


@functools.lru_cache(maxsize=None)
def load_arch_module(name: str):
    """Import e.g. 'turtle_arch' directly from its file (the arch files have
    no package-relative imports)."""
    path = os.path.join(ARCH_DIR, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


TINY_OPT = {
    # minimal option dict accepted by the reference make_model() and by
    # model_config_from_options(); dims divisible by 4 for posenc2d
    "model": "Turtle_t1_arch",
    "n_colors": 3,
    "dim": 8,
    "Enc_blocks": [1, 1, 2],
    "Middle_blocks": 2,
    "Dec_blocks": [2, 1, 1],
    "num_refinement_blocks": 1,
    "num_heads": [1, 2, 4, 8],
    "num_frames_tocache": 2,
    "ffn_expansion_factor": 2.5,
    "use_both_input": False,
    "encoder1_attn_type1": "ReducedAttn",
    "encoder1_attn_type2": "ReducedAttn",
    "encoder1_ffw_type": "FFW",
    "encoder2_attn_type1": "ReducedAttn",
    "encoder2_attn_type2": "ReducedAttn",
    "encoder2_ffw_type": "FFW",
    "encoder3_attn_type1": "Channel",
    "encoder3_attn_type2": "Channel",
    "encoder3_ffw_type": "GFFW",
    "decoder1_attn_type1": "Channel",
    "decoder1_attn_type2": "CHM",
    "decoder1_ffw_type": "GFFW",
    "decoder2_attn_type1": "Channel",
    "decoder2_attn_type2": "CHM",
    "decoder2_ffw_type": "GFFW",
    "decoder3_attn_type1": "Channel",
    "decoder3_attn_type2": "CHM",
    "decoder3_ffw_type": "GFFW",
    "latent_attn_type1": "FHR",
    "latent_attn_type2": "Channel",
    "latent_attn_type3": "FHR",
    "latent_ffw_type": "GFFW",
    "refinement_attn_type1": "ReducedAttn",
    "refinement_attn_type2": "ReducedAttn",
    "refinement_ffw_type": "GFFW",
}


def tiny_opt(model: str = "Turtle_t1_arch", **overrides) -> dict:
    opt = dict(TINY_OPT)
    opt["model"] = model
    opt.update(overrides)
    return opt


def build_reference_model(opt: dict, dtype="float64"):
    """Instantiate the reference torch model for the given option dict."""
    import torch

    name = opt["model"].lower()
    # tolerate the reference's own misspelling (SURVEY.md Q3)
    if name == "turtle_super_t1_arch":
        name = "turtlesuper_t1_arch"
    mod = load_arch_module(name)
    torch.manual_seed(0)
    model = mod.make_model(opt)
    model.eval()
    if dtype == "float64":
        model = model.double()
    return model
