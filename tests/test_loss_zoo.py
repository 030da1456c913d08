"""Golden parity for the static loss zoo and generic blocks against
torch-CPU evaluations of the reference formulas (`lib/loss.py:62-97`,
`lib/utils.py:36-46`, `lib/blocks.py:30-111`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pggan_tpu.losses import (attr_loss, id_loss, l1_loss,
                              l1_loss_with_same_person, l2_loss,
                              l2_loss_with_same_person)
from pggan_tpu.models import zoo


def rnd(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestLossZooGolden:
    def test_id_loss(self):
        a, b = rnd(6, 128, seed=1), rnd(6, 128, seed=2)
        want = (1 - torch.cosine_similarity(
            torch.from_numpy(a), torch.from_numpy(b), dim=1)).mean().item()
        got = float(id_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_l1_l2(self):
        a, b = rnd(4, 3, 8, 8, seed=3), rnd(4, 3, 8, 8, seed=4)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        np.testing.assert_allclose(
            float(l1_loss(jnp.asarray(a), jnp.asarray(b))),
            torch.nn.L1Loss()(ta, tb).item(), rtol=1e-6)
        np.testing.assert_allclose(
            float(l2_loss(jnp.asarray(a), jnp.asarray(b))),
            torch.nn.MSELoss()(ta, tb).item(), rtol=1e-6)

    @pytest.mark.parametrize("mask", [[1, 0, 1, 1], [0, 0, 0, 0], [1, 1, 1, 1]])
    def test_same_person_masked(self, mask):
        B = 4
        a, b = rnd(B, 3, 4, 4, seed=5), rnd(B, 3, 4, 4, seed=6)
        sp = np.asarray(mask, np.float32)
        ta, tb, tsp = map(torch.from_numpy, (a, b, sp))
        want1 = (torch.sum(torch.mean(torch.abs(ta - tb).reshape(B, -1),
                                      dim=1) * tsp) / (tsp.sum() + 1e-6)).item()
        want2 = (torch.sum(0.5 * torch.mean(torch.pow(ta - tb, 2).reshape(B, -1),
                                            dim=1) * tsp) / (tsp.sum() + 1e-6)).item()
        got1 = float(l1_loss_with_same_person(jnp.asarray(a), jnp.asarray(b),
                                              jnp.asarray(sp), B))
        got2 = float(l2_loss_with_same_person(jnp.asarray(a), jnp.asarray(b),
                                              jnp.asarray(sp), B))
        np.testing.assert_allclose(got1, want1, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-7)

    def test_attr_loss(self):
        B = 3
        a = [rnd(B, 8, 4, 4, seed=7), rnd(B, 16, 2, 2, seed=8)]
        b = [rnd(B, 8, 4, 4, seed=9), rnd(B, 16, 2, 2, seed=10)]
        want = 0.0
        for ai, bi in zip(a, b):
            want += torch.mean(torch.pow(torch.from_numpy(ai) - torch.from_numpy(bi), 2)
                               .reshape(B, -1), dim=1).sum()
        want = (want / 2.0).item()
        got = float(attr_loss([jnp.asarray(v) for v in a],
                              [jnp.asarray(v) for v in b], B))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestAdaINGolden:
    def test_adain_matches_torch(self):
        B, C, H, W, S = 2, 6, 5, 5, 16
        params = zoo.init_adain(jax.random.PRNGKey(0), style_dim=S, num_features=C)
        x = rnd(B, H, W, C, seed=11)
        s = rnd(B, S, seed=12)
        got = np.asarray(zoo.adain_apply(params, jnp.asarray(x), jnp.asarray(s)))

        # torch reference (lib/utils.py:36-46) with mapped weights
        fc_w = torch.from_numpy(np.asarray(params["fc"]["w"]).T.copy())
        fc_b = torch.from_numpy(np.asarray(params["fc"]["b"]))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        h = torch.from_numpy(s) @ fc_w.T + fc_b
        h = h.view(B, 2 * C, 1, 1)
        gamma, beta = torch.chunk(h, chunks=2, dim=1)
        norm = F.instance_norm(tx)
        want = ((1 + gamma) * norm + beta).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestLPIPSBackboneParity:
    def test_features_match_torch_alexnet_topology(self):
        # the backbone must be the exact torchvision AlexNet `features`
        # graph (paddings 2/2/1/1/1, stride-4 first conv, 3x3/2 maxpools
        # after relu1/relu2) so real LPIPS weights map layer-for-layer
        from pggan_tpu.losses.perceptual import PerceptualDistance
        pd = PerceptualDistance(seed=3)
        x = rnd(2, 3, 64, 64, seed=20)  # NCHW for torch
        got = pd._features(jnp.asarray(x.transpose(0, 2, 3, 1)))

        y = torch.from_numpy(x)
        want = []
        with torch.no_grad():
            for i, (p, stride, pad) in enumerate(zip(
                    pd.backbone, pd._STRIDES, pd._PADS)):
                w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
                b = torch.from_numpy(np.asarray(p["b"]))
                y = F.relu(F.conv2d(y, w, b, stride=stride, padding=pad))
                want.append(y.numpy().transpose(0, 2, 3, 1))
                if i in pd._POOL_AFTER:
                    y = F.max_pool2d(y, 3, 2)
        assert len(got) == 5
        for g, t in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), t, rtol=1e-4, atol=1e-5)


class TestGenericBlocks:
    def test_conv_block_shapes_and_modes(self):
        p = zoo.init_conv_block(jax.random.PRNGKey(1), input_dim=8,
                                output_dim=16, norm_type="bn")
        x = jnp.asarray(rnd(2, 16, 16, 8, seed=13))
        down = zoo.conv_block_apply(p, x, stride=2, norm_type="bn",
                                    activation_type="relu")
        assert down.shape == (2, 8, 8, 16)
        assert float(jnp.min(down)) >= 0.0          # relu
        up = zoo.conv_block_apply(p, x, stride=2, norm_type="bn",
                                  activation_type="relu", transpose=True)
        assert up.shape == (2, 32, 32, 16)

    def test_res_block_matches_torch(self):
        in_c, out_c = 6, 10
        p = zoo.init_res_block(jax.random.PRNGKey(2), in_c=in_c, out_c=out_c)
        x = rnd(2, 8, 8, in_c, seed=14)
        got = np.asarray(zoo.res_block_apply(p, jnp.asarray(x),
                                             scale_factor=1, norm="in",
                                             activation="lrelu"))
        # torch reference (lib/blocks.py:58-85), weights mapped HWIO→OIHW.
        # NOTE: the reference constructs norm1 with out_c even though it is
        # applied to an in_c tensor — harmless there because InstanceNorm2d
        # is affine-free; our norm is the (correct) in_c. Same math.
        def tconv(w, v):
            return F.conv2d(v, torch.from_numpy(
                np.asarray(w).transpose(3, 2, 0, 1).copy()), padding=1)
        def tconv1(w, v):
            return F.conv2d(v, torch.from_numpy(
                np.asarray(w).transpose(3, 2, 0, 1).copy()))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        h = F.leaky_relu(F.instance_norm(tx), 0.2)
        h = tconv(p["conv1"]["w"], h)
        h = F.leaky_relu(F.instance_norm(h), 0.2)
        h = tconv(p["conv2"]["w"], h)
        want = (h + tconv1(p["conv1x1"]["w"], tx)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_strided_conv_padding_matches_torch(self):
        """Zoo convs use the reference's explicit integer paddings: torch
        pads symmetrically, XLA 'SAME' pads end-heavy on strided convs —
        weight-ported modules would silently shift by one pixel."""
        p = zoo.init_conv_block(jax.random.PRNGKey(4), input_dim=5,
                                output_dim=7, kernel_size=3, norm_type="bn")
        x = rnd(2, 10, 10, 5, seed=17)
        got = np.asarray(zoo.conv_block_apply(
            p, jnp.asarray(x), stride=2, padding=1, norm_type="bn",
            activation_type="none"))
        tw = torch.from_numpy(
            np.asarray(p["conv"]["w"]).transpose(3, 2, 0, 1).copy())
        tb = torch.from_numpy(np.asarray(p["conv"]["b"]))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = F.conv2d(tx, tw, tb, stride=2, padding=1)
        y = F.batch_norm(y, None, None,
                         torch.from_numpy(np.asarray(p["norm"]["scale"])),
                         torch.from_numpy(np.asarray(p["norm"]["bias"])),
                         training=True)
        want = y.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_multiscale_downsample_matches_torch(self):
        """Between-scale pooling is AvgPool2d(3,2,1,count_include_pad=False)
        (`submodel/discriminator.py:146`)."""
        x = rnd(2, 9, 9, 4, seed=18)
        got = np.asarray(zoo._torch_avgpool3s2(jnp.asarray(x)))
        pool = torch.nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                  count_include_pad=False)
        want = pool(torch.from_numpy(x.transpose(0, 3, 1, 2))
                    ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_nlayer_patch_shapes_match_torch_formula(self):
        """k=4 padw=2 stride-2 stack: torch out = floor((H+2*2-4)/2)+1."""
        p = zoo.init_patch_discriminator(jax.random.PRNGKey(5),
                                         base_width=8, n_layers=3)
        x = jnp.asarray(rnd(1, 70, 70, 3, seed=19))
        out = zoo.patch_discriminator_apply(p, x)
        h = 70
        for _ in range(3):                     # stride-2 layers
            h = (h + 4 - 4) // 2 + 1
        h = (h + 4 - 4) // 1 + 1               # stride-1 layer
        h = (h + 4 - 4) // 1 + 1               # head
        assert out.shape == (1, h, h, 1)

    def test_adain_res_block_runs_and_grads(self):
        p = zoo.init_adain_res_block(jax.random.PRNGKey(3), in_c=8, out_c=12,
                                     style_dim=16)
        x = jnp.asarray(rnd(2, 8, 8, 8, seed=15))
        s = jnp.asarray(rnd(2, 16, seed=16))
        out = zoo.adain_res_block_apply(p, x, s, scale_factor=2)
        assert out.shape == (2, 16, 16, 12)
        g = jax.grad(lambda pp: jnp.sum(
            zoo.adain_res_block_apply(pp, x, s) ** 2))(p)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))
