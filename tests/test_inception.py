"""InceptionV3 FID extractor: weight-mapping + numerical parity against an
independent torch-functional expression of the canonical architecture
(torchvision itself is not installed in this image — the torch mirror
below transcribes torchvision's InceptionV3 pool3 path with NCHW
`F.conv2d`/`F.batch_norm`/torch pooling semantics, so layout, padding,
BN-eps and pooling translations are all cross-checked), plus npz
round-trip and the end-to-end trainer FID hook."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pggan_tpu.metrics import (InceptionV3Features,
                               convert_torchvision_state_dict,
                               fid_between_sets, inception_v3_features,
                               init_inception_v3)
from pggan_tpu.utils.checkpoint import arrays_to_tree, tree_to_arrays

# Stem convs that torchvision runs with padding=0 (VALID); every other
# conv uses symmetric k//2 padding. Reduction-branch stride-2 convs are
# also VALID (listed with their module paths).
_VALID = {
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_4a_3x3",
    "Mixed_6a/branch3x3", "Mixed_6a/branch3x3dbl_3",
    "Mixed_7a/branch3x3_2", "Mixed_7a/branch7x7x3_4",
}
_STRIDE2 = {"Conv2d_1a_3x3", "Mixed_6a/branch3x3", "Mixed_6a/branch3x3dbl_3",
            "Mixed_7a/branch3x3_2", "Mixed_7a/branch7x7x3_4"}


def _jax_tree_to_torch_state_dict(tree):
    """Inverse of convert_torchvision_state_dict: synthesize a torchvision-
    keyed state_dict from the jax pytree (randomized BN stats included)."""
    rs = np.random.RandomState(3)
    sd = {}
    for path, arr in tree_to_arrays(tree).items():
        parts = path.split("/")
        if parts[-1] == "w":
            mod = ".".join(parts[:-1])
            sd[f"{mod}.conv.weight"] = torch.from_numpy(
                arr.transpose(3, 2, 0, 1).copy())
        else:                      # <mod>/bn/{scale,bias,mean,var}
            mod = ".".join(parts[:-2])
            leaf = parts[-1]
            c = arr.shape[0]
            name = {"scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}[leaf]
            if leaf == "mean":
                arr = rs.randn(c).astype(np.float32) * 0.1
            elif leaf == "var":
                arr = (rs.rand(c).astype(np.float32) * 0.5 + 0.5)
            elif leaf == "scale":
                arr = (rs.rand(c).astype(np.float32) + 0.5)
            else:
                arr = rs.randn(c).astype(np.float32) * 0.1
            sd[f"{mod}.bn.{name}"] = torch.from_numpy(np.asarray(arr))
    return sd


def _tconv(sd, mod, x):
    w = sd[f"{mod}.conv.weight"]
    kh, kw = w.shape[2], w.shape[3]
    key = mod.replace(".", "/")
    stride = 2 if key in _STRIDE2 else 1
    pad = (0, 0) if key in _VALID else (kh // 2, kw // 2)
    y = F.conv2d(x, w, stride=stride, padding=pad)
    y = F.batch_norm(y, sd[f"{mod}.bn.running_mean"],
                     sd[f"{mod}.bn.running_var"], sd[f"{mod}.bn.weight"],
                     sd[f"{mod}.bn.bias"], training=False, eps=1e-3)
    return F.relu(y)


def _torch_pool3(sd, x):
    """Canonical InceptionV3 pool3 path in torch functional ops."""
    cat = lambda ts: torch.cat(ts, dim=1)
    apool = lambda v: F.avg_pool2d(v, 3, 1, 1)    # count_include_pad=True

    def block_a(n, v):
        b1 = _tconv(sd, f"{n}.branch1x1", v)
        b5 = _tconv(sd, f"{n}.branch5x5_2", _tconv(sd, f"{n}.branch5x5_1", v))
        b3 = _tconv(sd, f"{n}.branch3x3dbl_3", _tconv(
            sd, f"{n}.branch3x3dbl_2", _tconv(sd, f"{n}.branch3x3dbl_1", v)))
        return cat([b1, b5, b3, _tconv(sd, f"{n}.branch_pool", apool(v))])

    def block_b(n, v):
        b3 = _tconv(sd, f"{n}.branch3x3", v)
        bd = _tconv(sd, f"{n}.branch3x3dbl_3", _tconv(
            sd, f"{n}.branch3x3dbl_2", _tconv(sd, f"{n}.branch3x3dbl_1", v)))
        return cat([b3, bd, F.max_pool2d(v, 3, 2)])

    def block_c(n, v):
        b1 = _tconv(sd, f"{n}.branch1x1", v)
        b7 = v
        for i in (1, 2, 3):
            b7 = _tconv(sd, f"{n}.branch7x7_{i}", b7)
        bd = v
        for i in (1, 2, 3, 4, 5):
            bd = _tconv(sd, f"{n}.branch7x7dbl_{i}", bd)
        return cat([b1, b7, bd, _tconv(sd, f"{n}.branch_pool", apool(v))])

    def block_d(n, v):
        b3 = _tconv(sd, f"{n}.branch3x3_2", _tconv(sd, f"{n}.branch3x3_1", v))
        b7 = v
        for i in (1, 2, 3, 4):
            b7 = _tconv(sd, f"{n}.branch7x7x3_{i}", b7)
        return cat([b3, b7, F.max_pool2d(v, 3, 2)])

    def block_e(n, v):
        b1 = _tconv(sd, f"{n}.branch1x1", v)
        b3 = _tconv(sd, f"{n}.branch3x3_1", v)
        b3 = cat([_tconv(sd, f"{n}.branch3x3_2a", b3),
                  _tconv(sd, f"{n}.branch3x3_2b", b3)])
        bd = _tconv(sd, f"{n}.branch3x3dbl_2",
                    _tconv(sd, f"{n}.branch3x3dbl_1", v))
        bd = cat([_tconv(sd, f"{n}.branch3x3dbl_3a", bd),
                  _tconv(sd, f"{n}.branch3x3dbl_3b", bd)])
        return cat([b1, b3, bd, _tconv(sd, f"{n}.branch_pool", apool(v))])

    with torch.no_grad():
        x = _tconv(sd, "Conv2d_1a_3x3", x)
        x = _tconv(sd, "Conv2d_2a_3x3", x)
        x = _tconv(sd, "Conv2d_2b_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        x = _tconv(sd, "Conv2d_3b_1x1", x)
        x = _tconv(sd, "Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = block_a(n, x)
        x = block_b("Mixed_6a", x)
        for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = block_c(n, x)
        x = block_d("Mixed_7a", x)
        for n in ("Mixed_7b", "Mixed_7c"):
            x = block_e(n, x)
        return x.mean(dim=(2, 3)).numpy()


class TestInceptionParity:
    def test_weight_mapping_is_exact(self):
        # converted state_dict must fill EVERY leaf of the jax pytree
        template = init_inception_v3(jax.random.PRNGKey(0))
        sd = _jax_tree_to_torch_state_dict(template)
        arrays = convert_torchvision_state_dict(sd)
        tree = arrays_to_tree(template, arrays, strict=True)  # raises on mismatch
        assert len(tree_to_arrays(tree)) == len(arrays)

    def test_features_match_torch_reference(self):
        template = init_inception_v3(jax.random.PRNGKey(0))
        sd = _jax_tree_to_torch_state_dict(template)
        params = arrays_to_tree(template, convert_torchvision_state_dict(sd),
                                strict=True)
        x = np.random.RandomState(1).randn(2, 299, 299, 3).astype(np.float32)
        got = np.asarray(inception_v3_features(params, jnp.asarray(x),
                                               resize=False))
        want = _torch_pool3(sd, torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
        assert got.shape == (2, 2048)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestInceptionFIDEndToEnd:
    def test_npz_weights_roundtrip_and_fid(self, tmp_path):
        # synthetic npz weights load into the pytree and FID runs end-to-end
        src = init_inception_v3(jax.random.PRNGKey(7))
        path = str(tmp_path / "inception.npz")
        np.savez(path, **tree_to_arrays(src))
        extractor = InceptionV3Features(weights=path)
        for a, b in zip(jax.tree.leaves(extractor.params), jax.tree.leaves(src)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        rs = np.random.RandomState(0)
        real = [rs.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1 for _ in range(2)]
        fake = [rs.rand(4, 32, 32, 3).astype(np.float32) * 0.5 for _ in range(2)]
        same = fid_between_sets(iter(real), iter(real), extractor, max_samples=8)
        diff = fid_between_sets(iter(real), iter(fake), extractor, max_samples=8)
        assert np.isfinite(diff) and diff > same

    def test_trainer_hook_uses_inception(self, tmp_path):
        from pggan_tpu import Config
        from pggan_tpu.registry import create_model
        cfg = Config({
            "depths": [16, 16], "latent_dim": 32, "batch_per_gpu": 1,
            "max_step_at_scale": [4, 6],
            "alpha_jump_start": [-1, 1], "alpha_jump_interval": [0, 1],
            "alpha_jump_Ntimes": [0, 3],
            "loss_cycle": 100, "test_cycle": 1000, "ckpt_cycle": 1000,
            "save_root": str(tmp_path / "r"), "data_backend": "synthetic",
            "synthetic_dataset_size": 32, "num_data_workers": 1,
            "use_mGPU": True, "fid_extractor": "inception",
            "fid_samples": 8,
        })
        trainer = create_model(cfg)
        try:
            trainer.fit("incfid", max_step=2)
            fid = trainer.compute_fid(num_samples=8)
            assert np.isfinite(fid) and fid >= 0
        finally:
            trainer.close()
