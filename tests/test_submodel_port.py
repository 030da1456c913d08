"""Weight-portability tests for the submodel-zoo torch-state_dict
converters.

Each test builds a SYNTHETIC state_dict with the exact key/shape surface of
the reference torch module (no torch module construction needed — the
reference's structure is transcribed key-by-key, the same approach as
tests/test_backbones.py::TestE4EWeightPortability), converts it, and loads
it into the matching init_* template with `arrays_to_tree(strict=True)`:
every non-buffer torch tensor must land in exactly one pytree slot with
layouts transposed correctly.

Reference key surfaces covered:
  * ArcFace Backbone(50, 'ir_se')      — submodel/arcface.py:89-118
  * BiSeNet Resnet18 (torchvision keys) — submodel/resnet.py:10-89
  * BiSeNet(n_classes)                 — submodel/faceparser.py:190-207
  * ReconNet (vendored ResNet-50)      — submodel/deep3dmm.py:398-539
  * LPIPS (AlexNet + 1x1 heads)        — submodel/lpips.py:6-70
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.utils import checkpoint as ckpt_lib

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _mk(sd, rs, key, *shape):
    sd[key] = rs.randn(*shape).astype(np.float32) * 0.1


def _mk_bn(sd, rs, prefix, c):
    _mk(sd, rs, prefix + ".weight", c)
    _mk(sd, rs, prefix + ".bias", c)
    _mk(sd, rs, prefix + ".running_mean", c)
    sd[prefix + ".running_var"] = (1.0 + 0.1 * rs.rand(c)).astype(np.float32)
    sd[prefix + ".num_batches_tracked"] = np.asarray(3, np.int64)


def _n_buffers(sd):
    return sum(1 for k in sd if k.endswith("num_batches_tracked"))


def _synthetic_irse_trunk_sd(sd, rs, prefix=""):
    """input_layer + body of Backbone(50, 'ir_se') (arcface.py:92-113) —
    the identical module tree e4e embeds (e4e.py:192-202)."""
    _mk(sd, rs, prefix + "input_layer.0.weight", 64, 3, 3, 3)
    _mk_bn(sd, rs, prefix + "input_layer.1", 64)
    _mk(sd, rs, prefix + "input_layer.2.weight", 64)
    flat, c_in = 0, 64
    for width, count in [(64, 3), (128, 4), (256, 14), (512, 3)]:
        for _ in range(count):
            p = f"{prefix}body.{flat}"
            if c_in != width:
                _mk(sd, rs, p + ".shortcut_layer.0.weight", width, c_in, 1, 1)
                _mk_bn(sd, rs, p + ".shortcut_layer.1", width)
            _mk_bn(sd, rs, p + ".res_layer.0", c_in)
            _mk(sd, rs, p + ".res_layer.1.weight", width, c_in, 3, 3)
            _mk(sd, rs, p + ".res_layer.2.weight", width)
            _mk(sd, rs, p + ".res_layer.3.weight", width, width, 3, 3)
            _mk_bn(sd, rs, p + ".res_layer.4", width)
            _mk(sd, rs, p + ".res_layer.5.fc1.weight", width // 16, width, 1, 1)
            _mk(sd, rs, p + ".res_layer.5.fc2.weight", width, width // 16, 1, 1)
            flat, c_in = flat + 1, width
    return sd


def _synthetic_torchvision_resnet_sd(sd, rs, *, layers, bottleneck,
                                     prefix=""):
    """torchvision ResNet key scheme (conv1/bn1/layer{s}.{b}.conv{i} ...),
    shared by submodel/resnet.py:10-40 (basic) and the Deep3DMM vendored
    ResNet (deep3dmm.py:398-505, bottleneck)."""
    _mk(sd, rs, prefix + "conv1.weight", 64, 3, 7, 7)
    _mk_bn(sd, rs, prefix + "bn1", 64)
    widths = [64, 128, 256, 512]
    exp = 4 if bottleneck else 1
    c_in = 64
    for s, count in enumerate(layers):
        width = widths[s]
        out_ch = width * exp
        for b in range(count):
            p = f"{prefix}layer{s + 1}.{b}"
            stride = 2 if (s > 0 and b == 0) else 1
            if bottleneck:
                _mk(sd, rs, p + ".conv1.weight", width, c_in, 1, 1)
                _mk_bn(sd, rs, p + ".bn1", width)
                _mk(sd, rs, p + ".conv2.weight", width, width, 3, 3)
                _mk_bn(sd, rs, p + ".bn2", width)
                _mk(sd, rs, p + ".conv3.weight", out_ch, width, 1, 1)
                _mk_bn(sd, rs, p + ".bn3", out_ch)
            else:
                _mk(sd, rs, p + ".conv1.weight", width, c_in, 3, 3)
                _mk_bn(sd, rs, p + ".bn1", width)
                _mk(sd, rs, p + ".conv2.weight", width, width, 3, 3)
                _mk_bn(sd, rs, p + ".bn2", width)
            if stride != 1 or c_in != out_ch:
                _mk(sd, rs, p + ".downsample.0.weight", out_ch, c_in, 1, 1)
                _mk_bn(sd, rs, p + ".downsample.1", out_ch)
            c_in = out_ch
    return sd


class TestArcFacePortability:
    def test_strict_round_trip(self):
        from pggan_tpu.models.backbones import (convert_arcface_state_dict,
                                                init_irse)
        rs = np.random.RandomState(0)
        sd = _synthetic_irse_trunk_sd({}, rs)
        # output_layer (arcface.py:99-103): BN2d, Dropout, Flatten,
        # Linear(512*7*7, 512), BN1d
        _mk_bn(sd, rs, "output_layer.0", 512)
        _mk(sd, rs, "output_layer.3.weight", 512, 512 * 7 * 7)
        _mk(sd, rs, "output_layer.3.bias", 512)
        _mk_bn(sd, rs, "output_layer.4", 512)

        converted = convert_arcface_state_dict(sd, num_layers=50)
        assert len(converted) == len(sd) - _n_buffers(sd)
        template = init_irse(jax.random.PRNGKey(0), num_layers=50,
                             input_size=112)
        loaded = ckpt_lib.arrays_to_tree(template, converted, strict=True)
        # layout transforms: Linear [out,in] -> [in,out]; conv OIHW -> HWIO;
        # SE 1x1 [out,in,1,1] -> [in,out]
        np.testing.assert_allclose(np.asarray(loaded["head"]["w"]),
                                   sd["output_layer.3.weight"].T, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded["stem"]["w"]),
            np.transpose(sd["input_layer.0.weight"], (2, 3, 1, 0)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded["stages"][2][5]["se_fc1"]["w"]),
            sd["body.12.res_layer.5.fc1.weight"][:, :, 0, 0].T, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded["head_bn1d"]["mean"]),
                                   sd["output_layer.4.running_mean"],
                                   rtol=1e-6)


class TestResNetPortability:
    def test_resnet18_strict_round_trip(self):
        from pggan_tpu.models.backbones import (convert_resnet18_state_dict,
                                                init_resnet18)
        rs = np.random.RandomState(1)
        sd = _synthetic_torchvision_resnet_sd({}, rs, layers=(2, 2, 2, 2),
                                              bottleneck=False)
        # a torchvision checkpoint also carries the classifier; the
        # reference itself skips it (`resnet.py:38` `if 'fc' in k: continue`)
        _mk(sd, rs, "fc.weight", 1000, 512)
        _mk(sd, rs, "fc.bias", 1000)

        converted = convert_resnet18_state_dict(sd)
        assert len(converted) == len(sd) - _n_buffers(sd) - 2  # fc ignored
        template = init_resnet18(jax.random.PRNGKey(1))
        loaded = ckpt_lib.arrays_to_tree(template, converted, strict=True)
        np.testing.assert_allclose(
            np.asarray(loaded["stages"][1][0]["down"]["w"]),
            np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 1, 0)),
            rtol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded["stages"][3][1]["bn2"]["var"]),
                                   sd["layer4.1.bn2.running_var"], rtol=1e-6)


class TestReconNetPortability:
    def test_strict_round_trip(self):
        from pggan_tpu.models.face3d import (convert_reconnet_state_dict,
                                             init_reconnet)
        rs = np.random.RandomState(2)
        # vendored ResNet-50 with use_last_fc=False: NO fc keys
        # (deep3dmm.py:442 only builds self.fc when use_last_fc)
        sd = _synthetic_torchvision_resnet_sd({}, rs, layers=(3, 4, 6, 3),
                                              bottleneck=True,
                                              prefix="backbone.")
        for i, d in enumerate((80, 64, 80, 3, 27, 2, 1)):
            _mk(sd, rs, f"final_layers.{i}.weight", d, 2048, 1, 1)
            _mk(sd, rs, f"final_layers.{i}.bias", d)

        converted = convert_reconnet_state_dict(sd)
        assert len(converted) == len(sd) - _n_buffers(sd)
        template = init_reconnet(jax.random.PRNGKey(2))
        loaded = ckpt_lib.arrays_to_tree(template, converted, strict=True)
        np.testing.assert_allclose(
            np.asarray(loaded["heads"][0]["w"]),
            sd["final_layers.0.weight"][:, :, 0, 0].T, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded["backbone"]["stages"][0][0]["down"]["w"]),
            np.transpose(sd["backbone.layer1.0.downsample.0.weight"],
                         (2, 3, 1, 0)), rtol=1e-6)


class TestBiSeNetPortability:
    def test_strict_round_trip(self):
        from pggan_tpu.models.faceparser import (convert_bisenet_state_dict,
                                                 init_bisenet)
        rs = np.random.RandomState(3)
        sd = _synthetic_torchvision_resnet_sd({}, rs, layers=(2, 2, 2, 2),
                                              bottleneck=False,
                                              prefix="cp.resnet.")

        def conv_bn_relu(prefix, cin, cout, k):
            _mk(sd, rs, prefix + ".conv.weight", cout, cin, k, k)
            _mk_bn(sd, rs, prefix + ".bn", cout)

        for arm, cin in (("arm16", 256), ("arm32", 512)):
            conv_bn_relu(f"cp.{arm}.conv", cin, 128, 3)
            _mk(sd, rs, f"cp.{arm}.conv_atten.weight", 128, 128, 1, 1)
            _mk_bn(sd, rs, f"cp.{arm}.bn_atten", 128)
        conv_bn_relu("cp.conv_avg", 512, 128, 1)
        conv_bn_relu("cp.conv_head16", 128, 128, 3)
        conv_bn_relu("cp.conv_head32", 128, 128, 3)
        conv_bn_relu("ffm.convblk", 256, 256, 1)
        _mk(sd, rs, "ffm.conv1.weight", 64, 256, 1, 1)
        _mk(sd, rs, "ffm.conv2.weight", 256, 64, 1, 1)
        conv_bn_relu("conv_out.conv", 256, 256, 3)
        _mk(sd, rs, "conv_out.conv_out.weight", 19, 256, 1, 1)
        # deep-supervision training heads: present in real checkpoints,
        # never called by the reference forward (faceparser.py:203-207)
        for name, mid in (("conv_out16", 64), ("conv_out32", 64)):
            conv_bn_relu(f"{name}.conv", 128, mid, 3)
            _mk(sd, rs, f"{name}.conv_out.weight", 19, mid, 1, 1)

        converted = convert_bisenet_state_dict(sd)
        aux_keys = sum(1 for k in sd if k.startswith(("conv_out16",
                                                      "conv_out32"))
                       and not k.endswith("num_batches_tracked"))
        assert len(converted) == len(sd) - _n_buffers(sd) - aux_keys
        template = init_bisenet(jax.random.PRNGKey(3), n_classes=19)
        loaded = ckpt_lib.arrays_to_tree(template, converted, strict=True)
        np.testing.assert_allclose(
            np.asarray(loaded["arm32"]["atten"]["w"]),
            np.transpose(sd["cp.arm32.conv_atten.weight"], (2, 3, 1, 0)),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded["head"]["out"]["w"]),
            np.transpose(sd["conv_out.conv_out.weight"], (2, 3, 1, 0)),
            rtol=1e-6)


class TestLPIPSPortability:
    @staticmethod
    def _synthetic_lpips_sd(rs):
        """Exact key surface of the reference LPIPS module
        (lpips.py:6-23: `alexnet.layers` = torchvision alexnet `features`
        Sequential; `lpips_weights.{i}.main.1` = bias-free 1x1 conv)."""
        widths = (64, 192, 384, 256, 256)
        kernels = (11, 5, 3, 3, 3)
        sd, c_in = {}, 3
        for i, idx in enumerate((0, 3, 6, 8, 10)):
            _mk(sd, rs, f"alexnet.layers.{idx}.weight",
                widths[i], c_in, kernels[i], kernels[i])
            _mk(sd, rs, f"alexnet.layers.{idx}.bias", widths[i])
            c_in = widths[i]
        for i, c in enumerate(widths):
            sd[f"lpips_weights.{i}.main.1.weight"] = \
                np.abs(rs.randn(1, c, 1, 1)).astype(np.float32)
        return sd

    def test_convert_and_functional_parity(self):
        """from_torch_state_dict must reproduce the reference's forward
        (lpips.py:25-41: per-layer unit channel norm, squared diff,
        learned 1x1, spatial+batch mean, layer sum) bit-for-bit in f32."""
        from pggan_tpu.losses.perceptual import (PerceptualDistance,
                                                 convert_lpips_state_dict)
        rs = np.random.RandomState(4)
        sd = self._synthetic_lpips_sd(rs)
        arrays = convert_lpips_state_dict(sd)
        assert set(arrays) == {f"conv{i}_{s}" for i in range(5)
                               for s in "wb"} | {f"lin{i}" for i in range(5)}

        pd = PerceptualDistance.from_torch_state_dict(sd)
        x = rs.randn(2, 3, 64, 64).astype(np.float32)
        y = rs.randn(2, 3, 64, 64).astype(np.float32)
        got = float(pd(jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(y.transpose(0, 2, 3, 1))))

        # torch-side manual forward with the SAME weights
        strides, pads = (4, 1, 1, 1, 1), (2, 2, 1, 1, 1)
        xt, yt = torch.from_numpy(x), torch.from_numpy(y)
        want = torch.zeros(())
        with torch.no_grad():
            for i, idx in enumerate((0, 3, 6, 8, 10)):
                w = torch.from_numpy(sd[f"alexnet.layers.{idx}.weight"])
                b = torch.from_numpy(sd[f"alexnet.layers.{idx}.bias"])
                xt = F.relu(F.conv2d(xt, w, b, stride=strides[i],
                                     padding=pads[i]))
                yt = F.relu(F.conv2d(yt, w, b, stride=strides[i],
                                     padding=pads[i]))

                def unit(v):
                    return v * torch.rsqrt(
                        torch.sum(v ** 2, dim=1, keepdim=True) + 1e-10)

                d = (unit(xt) - unit(yt)) ** 2
                lin = torch.from_numpy(sd[f"lpips_weights.{i}.main.1.weight"])
                want = want + torch.mean(F.conv2d(d, lin))
                if i in (0, 1):
                    xt = F.max_pool2d(xt, 3, 2)
                    yt = F.max_pool2d(yt, 3, 2)
        np.testing.assert_allclose(got, float(want), rtol=2e-4)
