"""Weight portability from reference (PyTorch) PGGAN checkpoints.

Strategy: build a synthetic state_dict with the reference's exact key
surface (`pggan/nets.py` module tree) and random torch-layout tensors, run
an INDEPENDENT torch-functional golden forward that consumes that torch
layout directly (OIHW convs, NCHW activations, C-major flatten — the
reference math per `pggan/nets.py`/`lib/blocks.py`/`lib/layers.py`), then
convert via `models.torch_port` into our pytrees and check the JAX nets
reproduce the golden bit-for-bit (f32 tolerances). This exercises every
layout transform the converter performs.

The end-to-end test round-trips an actual `G_*.pt`/`D_*.pt` pair (torch
pickles shaped like `lib/checkpoint.py:22-34` writes) through
`tools/import_torch_ckpt.py` into a run dir that `demo.py`'s load path
accepts.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from pggan_tpu.models import (  # noqa: E402
    discriminator_apply,
    generator_apply,
    init_discriminator_params,
    init_generator_params,
)
from pggan_tpu.models.torch_port import (  # noqa: E402
    convert_discriminator_state_dict,
    convert_generator_state_dict,
    reference_schedule_meta,
)
from pggan_tpu.utils import checkpoint as ckpt_lib  # noqa: E402

DEPTHS = [16, 16, 8]
LATENT = 32


def _t(rng, *shape):
    return torch.from_numpy(rng.standard_normal(shape).astype(np.float32))


# ---------------------------------------------------------------------------
# synthetic reference state_dicts (exact torch key surface)
# ---------------------------------------------------------------------------

def make_g_state_dict(rng, scale, depths=DEPTHS, latent=LATENT,
                      apply_pixel_norm=True):
    """Keys exactly as `Generator.state_dict()` emits them: the Sequential
    conv indices depend on whether PixelNorm modules are interleaved
    (`lib/blocks.py:119-141`)."""
    d0 = depths[0]
    sd = {
        "latent_format_layer.module.weight": _t(rng, 16 * d0, latent),
        "latent_format_layer.module.bias": _t(rng, 16 * d0),
        "first_block.block.0.module.weight": _t(rng, d0, d0, 3, 3),
        "first_block.block.0.module.bias": _t(rng, d0),
    }
    j1 = 3 if apply_pixel_norm else 2
    for i in range(scale):
        prev, new = depths[i], depths[i + 1]
        sd[f"blocks.{i}.block.0.module.weight"] = _t(rng, new, prev, 3, 3)
        sd[f"blocks.{i}.block.0.module.bias"] = _t(rng, new)
        sd[f"blocks.{i}.block.{j1}.module.weight"] = _t(rng, new, new, 3, 3)
        sd[f"blocks.{i}.block.{j1}.module.bias"] = _t(rng, new)
    for i in range(scale + 1):
        sd[f"toRGB_blocks.{i}.toRGB.module.weight"] = _t(rng, 3, depths[i], 1, 1)
        sd[f"toRGB_blocks.{i}.toRGB.module.bias"] = _t(rng, 3)
    return sd


def make_d_state_dict(rng, scale, depths=DEPTHS, minibatch_norm=True):
    d0 = depths[0]
    entry = d0 + 1 if minibatch_norm else d0
    sd = {
        "decision_layer.module.weight": _t(rng, 1, d0),
        "decision_layer.module.bias": _t(rng, 1),
        "minibatch_normalization_block.conv.module.weight": _t(rng, d0, entry, 3, 3),
        "minibatch_normalization_block.conv.module.bias": _t(rng, d0),
        "minibatch_normalization_block.linear.module.weight": _t(rng, d0, d0 * 16),
        "minibatch_normalization_block.linear.module.bias": _t(rng, d0),
    }
    for i in range(scale):
        prev, new = depths[i], depths[i + 1]
        sd[f"blocks.{i}.block.0.module.weight"] = _t(rng, new, new, 3, 3)
        sd[f"blocks.{i}.block.0.module.bias"] = _t(rng, new)
        sd[f"blocks.{i}.block.2.module.weight"] = _t(rng, prev, new, 3, 3)
        sd[f"blocks.{i}.block.2.module.bias"] = _t(rng, prev)
    for i in range(scale + 1):
        sd[f"fromRGB_blocks.{i}.fromRGB.module.weight"] = _t(rng, depths[i], 3, 1, 1)
        sd[f"fromRGB_blocks.{i}.fromRGB.module.bias"] = _t(rng, depths[i])
    return sd


# ---------------------------------------------------------------------------
# independent torch-functional golden forwards (consume TORCH layout)
# ---------------------------------------------------------------------------

def _eq_conv(sd, prefix, x, padding):
    w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
    c = math.sqrt(2.0 / w[0].numel())
    return F.conv2d(x, w, b, padding=padding) * c


def _eq_linear(sd, prefix, x):
    w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
    c = math.sqrt(2.0 / w.shape[1])
    return F.linear(x, w, b) * c


def _pn(x):
    return x * torch.rsqrt((x * x).mean(dim=1, keepdim=True) + 1e-8)


def torch_generator_forward(sd, z, alpha, scale):
    """`Generator.forward` math (`pggan/nets.py:121-161`) consuming the
    torch state_dict directly."""
    x = _pn(z)
    x = F.leaky_relu(_eq_linear(sd, "latent_format_layer.module", x), 0.2)
    x = x.view(x.shape[0], -1, 4, 4)
    x = _pn(x)
    x = _pn(F.leaky_relu(_eq_conv(sd, "first_block.block.0.module", x, 1), 0.2))
    penultimate = x
    j1 = 3   # pixel_norm on
    for i in range(scale):
        penultimate = x
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = _pn(F.leaky_relu(_eq_conv(sd, f"blocks.{i}.block.0.module", x, 1), 0.2))
        x = _pn(F.leaky_relu(_eq_conv(sd, f"blocks.{i}.block.{j1}.module", x, 1), 0.2))
    out = _eq_conv(sd, f"toRGB_blocks.{scale}.toRGB.module", x, 0)
    if scale:
        prev = _eq_conv(sd, f"toRGB_blocks.{scale - 1}.toRGB.module",
                        penultimate, 0)
        prev = F.interpolate(prev, scale_factor=2, mode="nearest")
        out = (1.0 - alpha) * prev + alpha * out
    return out


def torch_discriminator_forward(sd, x, alpha, scale):
    """`Discriminator.forward` math (`pggan/nets.py:248-276`) + minibatch
    stddev (`lib/blocks.py:204-233`), torch layout."""
    if scale:
        down = F.avg_pool2d(x, 2)
        x_down = F.leaky_relu(
            _eq_conv(sd, f"fromRGB_blocks.{scale - 1}.fromRGB.module", down, 0),
            0.2)
    y = F.leaky_relu(
        _eq_conv(sd, f"fromRGB_blocks.{scale}.fromRGB.module", x, 0), 0.2)
    for pos, i in enumerate(reversed(range(scale))):
        y = F.leaky_relu(_eq_conv(sd, f"blocks.{i}.block.0.module", y, 1), 0.2)
        y = F.leaky_relu(_eq_conv(sd, f"blocks.{i}.block.2.module", y, 1), 0.2)
        y = F.avg_pool2d(y, 2)
        if pos == 0:
            y = (1.0 - alpha) * x_down + alpha * y
    # minibatch stddev channel, subgroup 4, unbiased var
    n, c, h, w = y.shape
    sg = min(n, 4)
    if n % sg:
        sg = n
    g = n // sg
    v = y.reshape(g, sg, c, h, w).var(dim=1, unbiased=True)
    stat = torch.sqrt(v + 1e-8).reshape(g, -1).mean(dim=1)
    stddev = stat.repeat_interleave(sg).reshape(n, 1, 1, 1).expand(n, 1, h, w)
    y = torch.cat([y, stddev], dim=1)
    y = F.leaky_relu(
        _eq_conv(sd, "minibatch_normalization_block.conv.module", y, 1), 0.2)
    y = y.reshape(n, -1)       # NCHW-major flatten (`lib/blocks.py:265`)
    y = F.leaky_relu(
        _eq_linear(sd, "minibatch_normalization_block.linear.module", y), 0.2)
    return _eq_linear(sd, "decision_layer.module", y)


# ---------------------------------------------------------------------------
# converter parity tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale,alpha", [(0, 1.0), (1, 0.3), (2, 0.7)])
def test_generator_conversion_matches_torch_golden(scale, alpha):
    rng = np.random.default_rng(7 + scale)
    sd = make_g_state_dict(rng, scale)
    z = rng.standard_normal((4, LATENT)).astype(np.float32)

    with torch.no_grad():
        golden = torch_generator_forward(
            sd, torch.from_numpy(z), alpha, scale).numpy()

    template = init_generator_params(
        jax.random.PRNGKey(0), latent_dim=LATENT, depths=DEPTHS, scale=scale)
    params = ckpt_lib.arrays_to_tree(
        template, convert_generator_state_dict(sd), strict=True)
    ours = generator_apply(params, jnp.asarray(z), jnp.float32(alpha))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    np.testing.assert_allclose(ours_nchw, golden, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("scale,alpha", [(0, 1.0), (1, 0.5), (2, 0.25)])
def test_discriminator_conversion_matches_torch_golden(scale, alpha):
    rng = np.random.default_rng(17 + scale)
    sd = make_d_state_dict(rng, scale)
    res = 4 * 2 ** scale
    x = rng.standard_normal((8, 3, res, res)).astype(np.float32)

    with torch.no_grad():
        golden = torch_discriminator_forward(
            sd, torch.from_numpy(x), alpha, scale).numpy()

    template = init_discriminator_params(
        jax.random.PRNGKey(0), depths=DEPTHS, scale=scale)
    params = ckpt_lib.arrays_to_tree(
        template, convert_discriminator_state_dict(sd), strict=True)
    ours = discriminator_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.float32(alpha))

    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-5, atol=2e-5)


def test_converter_rejects_foreign_keys():
    rng = np.random.default_rng(3)
    sd = make_g_state_dict(rng, 1)
    sd["blocks.0.block.1.running_mean"] = _t(rng, 4)
    with pytest.raises(KeyError, match="unrecognized"):
        convert_generator_state_dict(sd)


def test_converter_handles_pixel_norm_off_indices():
    """Without PixelNorm the second conv sits at Sequential index 2
    (`lib/blocks.py:119-141`); discovery must not assume index 3."""
    rng = np.random.default_rng(5)
    sd = make_g_state_dict(rng, 1, apply_pixel_norm=False)
    arrays = convert_generator_state_dict(sd)
    assert "blocks/0/conv1/w" in arrays
    assert arrays["blocks/0/conv1/w"].shape == (3, 3, DEPTHS[1], DEPTHS[1])


def test_schedule_meta_mapping():
    ckpt = {"alpha_G": 0.25, "alpha_D": 0.25, "alpha_index": 3,
            "alpha_jump_value": 0.01, "next_alpha_jump_step": 1234,
            "scale_index": 2, "next_scale_jump_step": 7000}
    meta = reference_schedule_meta(ckpt)
    assert meta == {"scale_index": 2, "alpha": 0.25, "alpha_index": 3,
                    "alpha_jump_value": 0.01, "next_scale_jump_step": 7000,
                    "next_alpha_jump_step": 1234}
    with pytest.raises(ValueError, match="alpha_G"):
        reference_schedule_meta({**ckpt, "alpha_D": 0.5})


# ---------------------------------------------------------------------------
# end-to-end: .pt files → import tool → our run dir → demo load path
# ---------------------------------------------------------------------------

def test_import_tool_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    scale, step, alpha = 2, 1500, 0.5
    sd_g = make_g_state_dict(rng, scale)
    sd_d = make_d_state_dict(rng, scale)
    ckpt_common = {
        "args": {"latent_dim": LATENT, "depths": DEPTHS, "input_dim": 3,
                 "batch_per_gpu": 4, "save_root": "train_result",
                 "run_id": "ref_run", "g_ema_decay": 0.0},
        "global_step": step, "alpha_G": alpha, "alpha_D": alpha,
        "alpha_index": 5, "alpha_jump_value": 0.01,
        "next_alpha_jump_step": 2000, "scale_index": scale,
        "next_scale_jump_step": 30000,
    }
    g_path, d_path = tmp_path / "G_1500.pt", tmp_path / "D_1500.pt"
    torch.save({**ckpt_common, "model": sd_g, "optimizer": {}}, g_path)
    torch.save({**ckpt_common, "model": sd_d, "optimizer": {}}, d_path)

    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "import_torch_ckpt",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "import_torch_ckpt.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    tool.main(["--g", str(g_path), "--d", str(d_path),
               "--run_id", "migrated", "--save_root", str(tmp_path),
               "--platform", ""])

    # the trainer/demo load path accepts the imported files
    for name in ("G", "D"):
        loaded = ckpt_lib.load_checkpoint(str(tmp_path), "migrated", name)
        assert loaded is not None
        arrays, opt_arrays, meta = loaded
        assert meta["global_step"] == step
        assert meta["schedule"]["scale_index"] == scale
        assert meta["schedule"]["alpha"] == alpha
        assert opt_arrays            # fresh Adam state was written
        assert meta["args"]["latent_dim"] == LATENT

    # imported G weights are the converted ones (sampling-equivalence)
    arrays, _, _ = ckpt_lib.load_checkpoint(str(tmp_path), "migrated", "G")
    template = init_generator_params(
        jax.random.PRNGKey(0), latent_dim=LATENT, depths=DEPTHS, scale=scale)
    params = ckpt_lib.arrays_to_tree(template, arrays, strict=True)
    z = rng.standard_normal((2, LATENT)).astype(np.float32)
    with torch.no_grad():
        golden = torch_generator_forward(
            sd_g, torch.from_numpy(z), alpha, scale).numpy()
    ours = generator_apply(params, jnp.asarray(z), jnp.float32(alpha))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), golden,
        rtol=2e-5, atol=2e-5)
