"""Forward parity against the LITERAL reference modules.

tests/test_torch_port.py checks the weight converter against an
independently re-derived torch-functional oracle; a re-derived oracle can
in principle encode the same misreading of the reference twice. This file
removes that gap: it imports `/root/reference/pggan/nets.py` ITSELF
(`Generator`/`Discriminator`, grown via their real `add_block`), converts
each module's own `state_dict()` through `models.torch_port`, and asserts
our JAX forwards reproduce the executing reference modules at multiple
scales and fade alphas.

The reference import chain needs two shims, neither touching its math:
  * `lib/utils.py:1-5` imports `torchvision` and `cv2` at module level
    (unused by the nets' forward paths) — empty module stubs satisfy it;
  * the imports resolve relative to the reference repo root, so
    `/root/reference` is appended to sys.path for the import and removed
    after (its `lib`/`pggan` are namespace packages; ours are
    `pggan_tpu.*`, no collision).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pggan_tpu.models import (  # noqa: E402
    discriminator_apply,
    generator_apply,
    init_discriminator_params,
    init_generator_params,
)
from pggan_tpu.models.torch_port import (  # noqa: E402
    convert_discriminator_state_dict,
    convert_generator_state_dict,
)
from pggan_tpu.utils import checkpoint as ckpt_lib  # noqa: E402

REFERENCE_ROOT = "/root/reference"
DEPTHS = [16, 16, 8]
LATENT = 32


@pytest.fixture(scope="module")
def reference_nets():
    """Import the literal reference `pggan.nets` with the two import shims
    (module docstring); skip cleanly if the reference tree is absent."""
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not available")
    stubbed = []
    for name in ("torchvision", "cv2"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from pggan import nets  # the reference's own module
    finally:
        sys.path.remove(REFERENCE_ROOT)
    yield nets
    for name in stubbed:
        sys.modules.pop(name, None)


def build_reference_g(nets, scale, alpha):
    """Reference construction sequence: Generator at depth[0], then
    `add_block` per scale (`pggan/model.py:127-139` grows exactly so)."""
    torch.manual_seed(100 + scale)
    g = nets.Generator(latent_dim=LATENT, first_depth=DEPTHS[0],
                       init_bias_to_zero=True, LReLU_slope=0.2,
                       apply_pixel_norm=True, last_activation=None,
                       output_dim=3, equalized_lr=True)
    for i in range(1, scale + 1):
        g.add_block(DEPTHS[i])
    # biases init to zero — randomize them so bias conversion is exercised
    with torch.no_grad():
        for name, p in g.named_parameters():
            if name.endswith(".bias"):
                p.normal_()
    g.alpha = alpha
    g.eval()
    return g


def build_reference_d(nets, scale, alpha):
    torch.manual_seed(200 + scale)
    d = nets.Discriminator(last_depth=DEPTHS[0], init_bias_to_zero=True,
                           LReLU_slope=0.2, decision_layer_size=1,
                           apply_minibatch_norm=True, input_dim=3,
                           equalized_lr=True)
    for i in range(1, scale + 1):
        d.add_block(DEPTHS[i])
    with torch.no_grad():
        for name, p in d.named_parameters():
            if name.endswith(".bias"):
                p.normal_()
    d.alpha = alpha
    d.eval()
    return d


@pytest.mark.parametrize("scale,alpha", [(0, 1.0), (1, 0.0), (1, 0.5),
                                         (2, 0.3), (2, 1.0)])
def test_generator_matches_literal_reference(reference_nets, scale, alpha):
    g = build_reference_g(reference_nets, scale, alpha)
    z = np.random.RandomState(scale).randn(4, LATENT).astype(np.float32)
    with torch.no_grad():
        golden = g(torch.from_numpy(z)).numpy()        # NCHW

    template = init_generator_params(
        jax.random.PRNGKey(0), latent_dim=LATENT, depths=DEPTHS, scale=scale)
    params = ckpt_lib.arrays_to_tree(
        template, convert_generator_state_dict(g.state_dict()), strict=True)
    ours = generator_apply(params, jnp.asarray(z), jnp.float32(alpha))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, golden, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("scale,alpha", [(0, 1.0), (1, 0.25), (2, 0.6),
                                         (2, 1.0)])
def test_discriminator_matches_literal_reference(reference_nets, scale, alpha):
    d = build_reference_d(reference_nets, scale, alpha)
    res = 4 * 2 ** scale
    x = np.random.RandomState(scale + 9).randn(8, 3, res, res).astype(np.float32)
    with torch.no_grad():
        golden = d(torch.from_numpy(x)).numpy()        # [B, 1]

    template = init_discriminator_params(
        jax.random.PRNGKey(0), depths=DEPTHS, scale=scale)
    params = ckpt_lib.arrays_to_tree(
        template, convert_discriminator_state_dict(d.state_dict()),
        strict=True)
    ours = discriminator_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.float32(alpha))
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-5, atol=2e-5)


def test_reference_get_feature_parity(reference_nets):
    """`get_feature=True` returns (decision, pre-decision feature)
    (`pggan/nets.py:273-277`); check the feature head too."""
    d = build_reference_d(reference_nets, 1, 0.7)
    x = np.random.RandomState(3).randn(8, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        out_t, feat_t = d(torch.from_numpy(x), get_feature=True)

    template = init_discriminator_params(
        jax.random.PRNGKey(0), depths=DEPTHS, scale=1)
    params = ckpt_lib.arrays_to_tree(
        template, convert_discriminator_state_dict(d.state_dict()),
        strict=True)
    out_j, feat_j = discriminator_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.float32(0.7), get_feature=True)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(),
                               rtol=2e-5, atol=2e-5)
