"""Parametric 3D face model + coefficient regressor — `submodel/deep3dmm.py`
analog (Deep3DFaceRecon).

Structural parity (◐, PARITY.md) with the reference's two halves:

  * `ParametricFaceModel` (`deep3dmm.py:14-289`): linear 3DMM — shape =
    mean + id_basis·α + exp_basis·β, texture = mean + tex_basis·δ, vertex
    normals, spherical-harmonics shading (`SH`, `deep3dmm.py:643+`),
    Euler-angle rotation, camera/image projection, landmark extraction,
    `split_coeff` of the 257-dim regression vector.
  * `ReconNet` (`deep3dmm.py:509-539`): a ResNet-50 (Bottleneck
    [3,4,6,3]) backbone + global pool + seven zero-initialized
    per-coefficient heads, matching the reference's use_last_fc=False
    configuration — weights npz-loadable by pytree path.

The reference requires BFM2009 .mat asset files it does not ship
(`transferBFM09`, `deep3dmm.py:562`); here the basis tensors AND the mesh
topology (face_buf/point_buf) are constructor arguments (loadable from
npz) with small fixed-seed synthetic defaults so the math is testable
end-to-end without proprietary data. With topology supplied, vertex
normals are the reference's exact gather-based algorithm; without it, a
documented pseudo-normal fallback.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pggan_tpu.models.backbones import init_resnet50, resnet50_apply

# 257-dim coefficient layout (deep3dmm.py:240-261)
_COEFF_SPLIT = {
    "id": (0, 80), "exp": (80, 144), "tex": (144, 224),
    "angle": (224, 227), "gamma": (227, 254), "trans": (254, 257),
}


def split_coeff(coeffs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[B, 257] → named groups (`deep3dmm.py:240-261`)."""
    return {k: coeffs[:, a:b] for k, (a, b) in _COEFF_SPLIT.items()}


def build_point_buf(face_buf: np.ndarray, n_vertices: int) -> np.ndarray:
    """Vertex→adjacent-face table [V, K] from triangles [F, 3] (host-side,
    numpy). Rows are padded with the sentinel F, which indexes the zero
    row `compute_norm` appends — the 0-indexed equivalent of the BFM
    `point_buf` the reference loads pre-built (`deep3dmm.py:46-47`)."""
    face_buf = np.asarray(face_buf)
    nf = face_buf.shape[0]
    adj = [[] for _ in range(n_vertices)]
    for f, tri in enumerate(face_buf):
        for vtx in tri:
            adj[int(vtx)].append(f)
    k = max(1, max(len(a) for a in adj))
    out = np.full((n_vertices, k), nf, dtype=np.int32)
    for vtx, faces in enumerate(adj):
        out[vtx, :len(faces)] = faces
    return out


class ParametricFaceModel:
    """Linear 3DMM. `bases` may additionally carry the mesh topology —
    `face_buf` [F,3] int triangle indices and `point_buf` [V,K] int
    vertex→adjacent-face table (entries in [0,F]; F selects the zero
    padding row), the 0-indexed form of the reference's BFM buffers
    (`deep3dmm.py:46-50`, where the 1-indexed .mat arrays get `-1`).
    With topology present, `compute_norm` runs the reference's exact
    algorithm (`deep3dmm.py:110-130`); without it, a documented
    pseudo-normal stand-in."""

    def __init__(self, *, n_vertices: int = 1024, n_landmarks: int = 68,
                 bases: Optional[Dict[str, np.ndarray]] = None,
                 focal: float = 1015.0, center: float = 112.0,
                 camera_distance: float = 10.0, seed: int = 0):
        v = n_vertices
        n_landmarks = min(n_landmarks, v)
        if bases is None:
            rs = np.random.RandomState(seed)
            bases = {
                "mean_shape": rs.randn(v * 3).astype(np.float32) * 0.1,
                "id_base": rs.randn(v * 3, 80).astype(np.float32) * 0.01,
                "exp_base": rs.randn(v * 3, 64).astype(np.float32) * 0.01,
                "mean_tex": rs.rand(v * 3).astype(np.float32),
                "tex_base": rs.randn(v * 3, 80).astype(np.float32) * 0.01,
                "landmark_index": rs.choice(v, n_landmarks, replace=False
                                            ).astype(np.int32),
            }
        bases = dict(bases)
        self.face_buf = bases.pop("face_buf", None)
        self.point_buf = bases.pop("point_buf", None)
        if self.face_buf is not None:
            self.face_buf = jnp.asarray(self.face_buf, jnp.int32)
            if self.point_buf is None:      # derive vertex→face adjacency
                self.point_buf = build_point_buf(np.asarray(self.face_buf), v)
            self.point_buf = jnp.asarray(self.point_buf, jnp.int32)
        self.b = {k: jnp.asarray(val) for k, val in bases.items()}
        self.n_vertices = v
        self.focal, self.center = focal, center
        self.camera_distance = camera_distance

    def compute_shape(self, id_coeff, exp_coeff):
        """mean + Bid·α + Bexp·β → [B, V, 3] (`deep3dmm.py:81-94`)."""
        batch = id_coeff.shape[0]
        s = (self.b["mean_shape"][None] + id_coeff @ self.b["id_base"].T
             + exp_coeff @ self.b["exp_base"].T)
        return s.reshape(batch, self.n_vertices, 3)

    def compute_texture(self, tex_coeff, normalize=True):
        """mean + Btex·δ (`deep3dmm.py:96-108`); /255 when normalize."""
        batch = tex_coeff.shape[0]
        t = self.b["mean_tex"][None] + tex_coeff @ self.b["tex_base"].T
        if normalize:
            t = t / 255.0
        return t.reshape(batch, self.n_vertices, 3)

    def compute_rotation(self, angles):
        """Euler XYZ → rotation matrices [B,3,3] (`deep3dmm.py:165-198`)."""
        x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
        ones, zeros = jnp.ones_like(x), jnp.zeros_like(x)
        rx = jnp.stack([ones, zeros, zeros,
                        zeros, jnp.cos(x), -jnp.sin(x),
                        zeros, jnp.sin(x), jnp.cos(x)], -1).reshape(-1, 3, 3)
        ry = jnp.stack([jnp.cos(y), zeros, jnp.sin(y),
                        zeros, ones, zeros,
                        -jnp.sin(y), zeros, jnp.cos(y)], -1).reshape(-1, 3, 3)
        rz = jnp.stack([jnp.cos(z), -jnp.sin(z), zeros,
                        jnp.sin(z), jnp.cos(z), zeros,
                        zeros, zeros, ones], -1).reshape(-1, 3, 3)
        return jnp.transpose(rz @ ry @ rx, (0, 2, 1))

    def transform(self, shape, rot, trans):
        """shape @ R + t (`deep3dmm.py:218-228`)."""
        return shape @ rot + trans[:, None, :]

    def to_camera(self, shape):
        """Flip z into the camera frame (`deep3dmm.py:200-202`)."""
        return shape.at[..., 2].set(self.camera_distance - shape[..., 2])

    def to_image(self, shape):
        """Perspective projection → [B, V, 2] (`deep3dmm.py:204-216`)."""
        xy = shape[..., :2] * self.focal / shape[..., 2:3]
        return xy + self.center

    def get_landmarks(self, proj):
        """[B, V, 2] → [B, 68, 2] (`deep3dmm.py:230-238`)."""
        return proj[:, self.b["landmark_index"]]

    def compute_norm(self, shape):
        """Unit vertex normals [B, V, 3].

        With mesh topology (face_buf/point_buf in `bases`), the
        reference's exact algorithm (`deep3dmm.py:110-130`) — all
        gathers, no scatters, so it maps cleanly onto TPU:
        per-face normals cross(v1-v2, v2-v3) L2-normalized, a zero row
        appended at index F, adjacent face normals gathered per vertex
        via point_buf and summed, then L2-normalized (torch
        F.normalize semantics: x / max(|x|, 1e-12)).

        Without topology: the normalized vertex direction, a documented
        structural stand-in."""
        if self.face_buf is None:
            return shape * jax.lax.rsqrt(
                jnp.sum(shape ** 2, -1, keepdims=True) + 1e-8)

        def _normalize(x):
            n = jnp.linalg.norm(x, axis=-1, keepdims=True)
            return x / jnp.maximum(n, 1e-12)

        v1 = shape[:, self.face_buf[:, 0]]
        v2 = shape[:, self.face_buf[:, 1]]
        v3 = shape[:, self.face_buf[:, 2]]
        face_norm = _normalize(jnp.cross(v1 - v2, v2 - v3))   # [B, F, 3]
        face_norm = jnp.concatenate(
            [face_norm, jnp.zeros_like(face_norm[:, :1])], axis=1)
        vertex_norm = jnp.sum(face_norm[:, self.point_buf], axis=2)
        return _normalize(vertex_norm)

    @staticmethod
    def compute_color(texture, norm, gamma):
        """Spherical-harmonics shading (`deep3dmm.py:132-163` / SH class):
        9-band SH on vertex normals, per-channel gamma, DC offset +0.8."""
        batch = gamma.shape[0]
        g = gamma.reshape(batch, 3, 9)
        g = g.at[..., 0].add(0.8)
        a = [np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)]
        c = [1 / np.sqrt(4 * np.pi), np.sqrt(3.0) / np.sqrt(4 * np.pi),
             3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)]
        nx, ny, nz = norm[..., 0], norm[..., 1], norm[..., 2]
        ones = jnp.ones_like(nx)
        sh = jnp.stack([
            a[0] * c[0] * ones,
            -a[1] * c[1] * ny, a[1] * c[1] * nz, -a[1] * c[1] * nx,
            a[2] * c[2] * nx * ny, -a[2] * c[2] * ny * nz,
            0.5 * a[2] * c[2] / np.sqrt(3.0) * (3 * nz ** 2 - 1),
            -a[2] * c[2] * nx * nz,
            0.5 * a[2] * c[2] * (nx ** 2 - ny ** 2),
        ], axis=-1)                                       # [B, V, 9]
        radiance = jnp.einsum("bvk,bck->bvc", sh, g)      # [B, V, 3]
        return texture * radiance

    def compute_for_render(self, coeffs) -> Dict[str, jnp.ndarray]:
        """Full pipeline (`deep3dmm.py:263-289`): coeffs → posed vertices,
        projected landmarks, shaded color."""
        c = split_coeff(coeffs)
        shape = self.compute_shape(c["id"], c["exp"])
        rot = self.compute_rotation(c["angle"])
        posed = self.transform(shape, rot, c["trans"])
        cam = self.to_camera(posed)
        proj = self.to_image(cam)
        tex = self.compute_texture(c["tex"])
        norm = self.compute_norm(shape) @ rot
        color = self.compute_color(tex, norm, c["gamma"])
        return {"vertices": cam, "projection": proj,
                "landmarks": self.get_landmarks(proj), "color": color}


# Per-coefficient head widths (`deep3dmm.py:517-525`): id 80, exp 64,
# tex 80, angle 3, gamma 27, (tx,ty) 2, tz 1 — zero-initialized 1×1 convs
# on the pooled 2048-d ResNet-50 feature.
_RECONNET_HEADS = (80, 64, 80, 3, 27, 2, 1)


def init_reconnet(rng: jax.Array, *, coeff_dim: int = 257) -> Dict[str, Any]:
    """Coefficient regressor (`ReconNet`, `deep3dmm.py:509-539`): a
    ResNet-50 (Bottleneck [3,4,6,3]) backbone + global average pool +
    SEVEN zero-initialized per-coefficient heads whose outputs concatenate
    to the 257-vector (the reference's use_last_fc=False configuration)."""
    assert coeff_dim == sum(_RECONNET_HEADS)
    return {
        "backbone": init_resnet50(jax.random.fold_in(rng, 0)),
        "heads": [{"w": jnp.zeros((2048, d)), "b": jnp.zeros((d,))}
                  for d in _RECONNET_HEADS],
    }


def reconnet_apply(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """NHWC face crop → [B, 257] coefficients (id|exp|tex|angle|gamma|
    tx,ty|tz concat order, `deep3dmm.py:531-538`)."""
    feat = resnet50_apply(params["backbone"], x)
    feat = jnp.mean(feat, axis=(1, 2))           # adaptive avg pool → 2048
    outs = [feat @ h["w"] + h["b"] for h in params["heads"]]
    return jnp.concatenate(outs, axis=-1)


def convert_reconnet_state_dict(sd):
    """torch `ReconNet().state_dict()` (`deep3dmm.py:509-539`,
    use_last_fc=False) → flat path dict for
    `arrays_to_tree(init_reconnet(...), out, strict=True)`.

    `backbone.*` follows the torchvision ResNet-50 key scheme (the
    reference vendors torchvision's ResNet verbatim, `deep3dmm.py:398-505`);
    `final_layers.{i}` are 1×1 convs on the pooled [B,2048,1,1] map —
    weight [d,2048,1,1] → the head matrix [2048,d], bias unchanged."""
    import numpy as np

    from pggan_tpu.models.backbones import convert_resnet50_state_dict

    out = {}
    for path, arr in convert_resnet50_state_dict(
            sd, torch_prefix="backbone.").items():
        out[f"backbone/{path}"] = arr
    for i in range(len(_RECONNET_HEADS)):
        w = np.asarray(sd[f"final_layers.{i}.weight"])   # [d, 2048, 1, 1]
        out[f"heads/{i}/w"] = w[:, :, 0, 0].T
        out[f"heads/{i}/b"] = np.asarray(sd[f"final_layers.{i}.bias"])
    return out
