"""Synthetic golden scenes with analytic geometry (SURVEY.md SS4).

The reference validated itself only end-to-end on DTU; DTU data is not
available in this environment, so correctness is anchored on scenes where the
true surface is known in closed form: a textured sphere (and a plane)
ray-traced from calibrated synthetic cameras.  Every stage of the pipeline —
CVC gather, fusion, ray pooling, sweep, merge — can then be checked against
analytic accuracy/completeness bounds without any dataset.

Host-side numpy: scene generation is not on the device hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from surfacenet_tpu.geometry.camera import look_at_projection


@dataclasses.dataclass
class SyntheticScene:
    images: np.ndarray  # (V, H, W, 3) float32 in [0, 1]
    Ps: np.ndarray  # (V, 3, 4) float64
    bbox_min: np.ndarray  # (3,) mm
    bbox_max: np.ndarray  # (3,) mm
    # analytic surface: sphere
    center: np.ndarray  # (3,)
    radius: float

    def surface_points(self, n: int, seed: int = 0) -> np.ndarray:
        """Uniform samples on the analytic surface (for completeness eval)."""
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return self.center + self.radius * v

    def surface_distance(self, pts: np.ndarray) -> np.ndarray:
        """Unsigned distance from points to the analytic surface (mm)."""
        return np.abs(
            np.linalg.norm(pts - self.center, axis=-1) - self.radius
        )

    def occupancy(self, centers: np.ndarray, s: float) -> np.ndarray:
        """GT occupancy labels: voxel center within half a voxel diagonal of
        the surface (the voxelization rule used for training labels)."""
        return self.surface_distance(centers) <= (s * np.sqrt(3) / 2)


def degrade_scene(
    scene,
    *,
    noise_std: float = 0.0,
    exposure_jitter: float = 0.0,
    wb_jitter: float = 0.0,
    n_clutter: int = 0,
    calib_sigma_px: float = 0.0,
    bg: float = 0.1,
    seed: int = 0,
):
    """Real-imaging degradations on a clean synthetic scene (VERDICT r4:
    the testable proxy for DTU's photographs while the dataset is absent —
    sensor noise, 7 lighting conditions, exposure variation, background
    clutter, imperfect calibration; SURVEY.md SS6 / BASELINE tolerance).

    Args:
      noise_std: additive zero-mean Gaussian sensor noise per pixel
        (fraction of full scale; DTU-class sensors ~0.005-0.02).
      exposure_jitter: per-VIEW log-normal gain sigma — exposure /
        lighting variation between views (the rXXXX light conditions).
      wb_jitter: per-view per-CHANNEL log-normal gain sigma (white
        balance drift between views).
      n_clutter: textured rectangles pasted per view onto BACKGROUND
        pixels only (lab clutter behind the object; the object itself is
        never occluded — occlusion has its own golden scene).
      calib_sigma_px: per-view principal-point shift sigma in pixels,
        applied to P as P[0] += du*P[2], P[1] += dv*P[2] — the
        first-order model of imperfect calibration (a pure image-space
        offset of du,dv pixels).
      bg: the renderer's constant background value (clutter mask).

    Returns a scene of the same dataclass with degraded images/Ps; the
    analytic GT surface is untouched, so accuracy/completeness curves
    measure robustness alone.
    """
    rng = np.random.default_rng(seed)
    imgs = np.asarray(scene.images, np.float32).copy()
    V, H, W, _ = imgs.shape

    if n_clutter:
        # background = pixels still at the constant render background
        bg_mask = np.all(np.abs(imgs - bg) < 1e-3, axis=-1)  # (V, H, W)
        for v in range(V):
            for _ in range(n_clutter):
                ch = int(rng.integers(H // 12, H // 4))
                cw = int(rng.integers(W // 12, W // 4))
                y0 = int(rng.integers(0, H - ch))
                x0 = int(rng.integers(0, W - cw))
                yy, xx = np.meshgrid(
                    np.arange(ch), np.arange(cw), indexing="ij"
                )
                f = rng.uniform(0.1, 0.7, 2)
                ph = rng.uniform(0, 2 * np.pi, 3)
                tex = 0.5 + 0.45 * np.sin(
                    f[0] * yy[..., None] + f[1] * xx[..., None] + ph
                )
                sel = bg_mask[v, y0 : y0 + ch, x0 : x0 + cw]
                imgs[v, y0 : y0 + ch, x0 : x0 + cw][sel] = tex[sel]

    if exposure_jitter:
        imgs = imgs * np.exp(
            rng.normal(0.0, exposure_jitter, (V, 1, 1, 1))
        ).astype(np.float32)
    if wb_jitter:
        imgs = imgs * np.exp(
            rng.normal(0.0, wb_jitter, (V, 1, 1, 3))
        ).astype(np.float32)
    if noise_std:
        imgs = imgs + rng.normal(0.0, noise_std, imgs.shape)
    imgs = np.clip(imgs, 0.0, 1.0).astype(np.float32)

    Ps = np.asarray(scene.Ps, np.float64).copy()
    if calib_sigma_px:
        duv = rng.normal(0.0, calib_sigma_px, (V, 2))
        for v in range(V):
            Ps[v, 0] += duv[v, 0] * Ps[v, 2]
            Ps[v, 1] += duv[v, 1] * Ps[v, 2]

    return dataclasses.replace(scene, images=imgs, Ps=Ps)


def _texture(pts: np.ndarray, center: np.ndarray) -> np.ndarray:
    """High-frequency procedural RGB texture on the surface — photometric
    texture is what makes CVC matching informative."""
    q = (pts - center) * 0.35
    r = 0.5 + 0.5 * np.sin(3.1 * q[..., 0] + 1.7 * np.sin(2.3 * q[..., 1]))
    g = 0.5 + 0.5 * np.sin(2.7 * q[..., 1] + 1.3 * np.sin(1.9 * q[..., 2]))
    b = 0.5 + 0.5 * np.sin(3.7 * q[..., 2] + 2.1 * np.sin(2.9 * q[..., 0]))
    return np.stack([r, g, b], axis=-1)


def _trace_sphere(
    P: np.ndarray,
    hw: Tuple[int, int],
    center: np.ndarray,
    radius: float,
    bg: float = 0.1,
) -> np.ndarray:
    """Ray-trace a textured sphere for one camera (vectorized over pixels)."""
    H, W = hw
    M = P[:, :3]
    p4 = P[:, 3]
    cam = -np.linalg.solve(M, p4)
    Minv = np.linalg.inv(M)

    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pix = np.stack([u, v, np.ones_like(u)], axis=-1)  # (H, W, 3)
    dirs = pix @ Minv.T  # ray directions (unnormalized)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    oc = cam - center
    b = np.sum(dirs * oc, axis=-1)
    c = np.dot(oc, oc) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    pts = cam + dirs * t[..., None]
    img = np.full((H, W, 3), bg, np.float64)
    img[hit] = _texture(pts[hit], center)
    return img.astype(np.float32)


@dataclasses.dataclass
class SDFScene:
    """Golden scene defined by a signed-distance field (harder geometry:
    occlusions, concavities, multiple bodies — VERDICT r1 item 8).

    Mirrors SyntheticScene's API (images/Ps/bbox/surface_points/
    surface_distance/occupancy) so tests and training code accept either.
    ``tori``: list of (center, axis, R, r) — the analytic truth.
    """

    images: np.ndarray
    Ps: np.ndarray
    bbox_min: np.ndarray
    bbox_max: np.ndarray
    tori: Tuple

    def _sdf(self, p: np.ndarray) -> np.ndarray:
        d = None
        for center, axis, R, r in self.tori:
            q = p - center
            h = q @ axis
            radial = np.linalg.norm(
                q - h[..., None] * axis, axis=-1
            )
            di = np.sqrt((radial - R) ** 2 + h**2) - r
            d = di if d is None else np.minimum(d, di)
        return d

    def sdf_jnp(self, p):
        """jnp twin of the SDF, for jitted oracle predictors."""
        import jax.numpy as jnp

        d = None
        for center, axis, R, r in self.tori:
            q = p - jnp.asarray(center, p.dtype)
            ax = jnp.asarray(axis, p.dtype)
            h = q @ ax
            radial = jnp.linalg.norm(q - h[..., None] * ax, axis=-1)
            di = jnp.sqrt((radial - R) ** 2 + h**2) - r
            d = di if d is None else jnp.minimum(d, di)
        return d

    def surface_points(self, n: int, seed: int = 0) -> np.ndarray:
        """~Area-uniform samples on the union surface (rejection on the
        ring-angle Jacobian; samples inside the other torus discarded)."""
        rng = np.random.default_rng(seed)
        out = []
        remaining = n
        while remaining > 0:
            m = remaining * 2 + 16
            ti = rng.integers(0, len(self.tori), m)
            pts = np.zeros((m, 3))
            for i, (center, axis, R, r) in enumerate(self.tori):
                sel = ti == i
                k = int(sel.sum())
                if k == 0:
                    continue
                u = rng.uniform(0, 2 * np.pi, k)
                v = rng.uniform(0, 2 * np.pi, k)
                keep = rng.uniform(0, 1, k) < (
                    (R + r * np.cos(v)) / (R + r)
                )
                axis = np.asarray(axis, np.float64)
                e1 = np.cross(axis, [0.917, 0.312, 0.248])
                e1 /= np.linalg.norm(e1)
                e2 = np.cross(axis, e1)
                ring = (R + r * np.cos(v))[:, None] * (
                    np.cos(u)[:, None] * e1 + np.sin(u)[:, None] * e2
                )
                p = center + ring + (r * np.sin(v))[:, None] * axis
                p[~keep] = np.nan
                pts[sel] = p
            ok = ~np.isnan(pts[:, 0])
            # drop samples buried inside the OTHER torus
            ok &= self._sdf(pts) > -1e-6
            out.append(pts[ok][:remaining])
            remaining -= len(out[-1])
        return np.concatenate(out)[:n]

    def surface_distance(self, pts: np.ndarray) -> np.ndarray:
        return np.abs(self._sdf(pts))

    def occupancy(self, centers: np.ndarray, s: float) -> np.ndarray:
        return self.surface_distance(centers) <= (s * np.sqrt(3) / 2)


def _trace_sdf(
    P: np.ndarray,
    hw: Tuple[int, int],
    scene_sdf,
    t_near: float,
    t_far: float,
    bg: float = 0.1,
    n_steps: int = 96,
) -> np.ndarray:
    """Sphere-trace an SDF for one camera (vectorized over pixels)."""
    H, W = hw
    M = P[:, :3]
    p4 = P[:, 3]
    cam = -np.linalg.solve(M, p4)
    Minv = np.linalg.inv(M)

    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pix = np.stack([u, v, np.ones_like(u)], axis=-1)
    dirs = pix @ Minv.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    t = np.full((H, W), t_near)
    hit = np.zeros((H, W), bool)
    live = np.ones((H, W), bool)
    for _ in range(n_steps):
        pts = cam + dirs * t[..., None]
        d = scene_sdf(pts)
        newly = live & (d < 1e-3)
        hit |= newly
        live &= ~newly
        t = np.where(live, t + np.maximum(d, 1e-3), t)
        live &= t < t_far
        if not live.any():
            break
    pts = cam + dirs * t[..., None]
    img = np.full((H, W, 3), bg, np.float64)
    img[hit] = _texture(pts[hit], np.zeros(3))
    return img.astype(np.float32)


def make_tori_scene(
    n_views: int = 8,
    hw: Tuple[int, int] = (120, 160),
    R: float = 18.0,
    r: float = 5.0,
    cam_dist: float = 120.0,
    focal: float = 200.0,
    seed: int = 0,
) -> SDFScene:
    """Two interlocking textured tori: occlusions, concavities, and a
    through-hole — the harder golden scene.  Torus A lies in the xy-plane
    at the origin; torus B in the xz-plane threads through A's hole.
    Tube circles stay > 2r apart so the union surface is the analytic
    truth everywhere."""
    tori = (
        (np.zeros(3), np.array([0.0, 0.0, 1.0]), R, r),
        (np.array([R, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]), R, r),
    )
    probe = SDFScene(
        images=np.zeros((0,)), Ps=np.zeros((0,)),
        bbox_min=np.zeros(3), bbox_max=np.zeros(3), tori=tori,
    )

    center = np.array([R / 2, 0.0, 0.0])
    H, W = hw
    Ps = []
    images = []
    rng = np.random.default_rng(seed)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        elev = 0.45 + 0.12 * rng.standard_normal()
        eye = center + cam_dist * np.array(
            [
                np.cos(ang) * np.cos(elev),
                np.sin(ang) * np.cos(elev),
                np.sin(elev),
            ]
        )
        P = look_at_projection(
            eye, center, np.array([0.0, 0.0, 1.0]), focal, (W / 2, H / 2)
        )
        Ps.append(P)
        images.append(
            _trace_sdf(
                P, hw, probe._sdf,
                t_near=cam_dist - 3 * R, t_far=cam_dist + 3 * R,
            )
        )

    pad = r
    lo = center - (1.5 * R + r + pad)
    hi = center + (1.5 * R + r + pad)
    return SDFScene(
        images=np.stack(images),
        Ps=np.stack(Ps),
        bbox_min=lo,
        bbox_max=hi,
        tori=tori,
    )


def _occluder_texture(pts: np.ndarray) -> np.ndarray:
    """REPEATED high-frequency tile pattern: locally textured (so naive
    photoconsistency can latch onto false matches) but globally ambiguous,
    and entirely unlike the sphere's texture family."""
    q = pts * 0.9  # ~7 mm tile period
    r = 0.5 + 0.5 * np.sign(np.sin(0.9 * q[..., 0]) * np.sin(0.9 * q[..., 1]))
    g = 0.5 + 0.5 * np.sin(5.0 * q[..., 2])
    b = np.full_like(r, 0.25)
    return np.stack([r, 0.6 * g, b], axis=-1)


def _trace_occluded_sphere(
    P: np.ndarray,
    hw: Tuple[int, int],
    center: np.ndarray,
    radius: float,
    occ_center: np.ndarray,
    occ_normal: np.ndarray,
    occ_radius: float,
    specular: float = 0.0,
    bg: float = 0.1,
) -> np.ndarray:
    """Ray-trace the textured sphere behind a textured occluder disk;
    nearest hit wins.  Optional Phong-style specular lobe on the sphere
    (view-DEPENDENT shading: violates photoconsistency across baselines,
    the paper's specularity failure mode for fixed pair weights)."""
    H, W = hw
    M = P[:, :3]
    p4 = P[:, 3]
    cam = -np.linalg.solve(M, p4)
    Minv = np.linalg.inv(M)

    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pix = np.stack([u, v, np.ones_like(u)], axis=-1)
    dirs = pix @ Minv.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    # sphere hit
    oc = cam - center
    b = np.sum(dirs * oc, axis=-1)
    c = np.dot(oc, oc) - radius**2
    disc = b * b - c
    s_hit = disc > 0
    t_s = -b - np.sqrt(np.maximum(disc, 0.0))
    s_hit &= t_s > 0

    # occluder disk hit
    denom = dirs @ occ_normal
    t_d = np.where(
        np.abs(denom) > 1e-9,
        ((occ_center - cam) @ occ_normal) / denom,
        -1.0,
    )
    p_d = cam + dirs * t_d[..., None]
    d_hit = (t_d > 0) & (
        np.linalg.norm(p_d - occ_center, axis=-1) < occ_radius
    )

    img = np.full((H, W, 3), bg, np.float64)
    sphere_front = s_hit & (~d_hit | (t_s < t_d))
    pts_s = cam + dirs * t_s[..., None]
    col = _texture(pts_s[sphere_front], center)
    if specular > 0.0:
        # light fixed above the scene; highlight follows the CAMERA
        n_s = pts_s[sphere_front] - center
        n_s /= np.linalg.norm(n_s, axis=-1, keepdims=True)
        light = np.array([0.3, -0.2, 1.0])
        light = light / np.linalg.norm(light)
        refl = 2 * (n_s @ light)[:, None] * n_s - light
        view = -dirs[sphere_front]
        spec = np.clip(np.sum(refl * view, axis=-1), 0.0, 1.0) ** 24
        col = np.clip(col + specular * spec[:, None], 0.0, 1.0)
    img[sphere_front] = col
    disk_front = d_hit & (~sphere_front | (t_d < t_s))
    img[disk_front] = _occluder_texture(p_d[disk_front])
    return img.astype(np.float32)


@dataclasses.dataclass
class OccludedScene(SyntheticScene):
    """SyntheticScene + the occluder disk's analytic parameters, so tests
    and eval scripts can derive ground-truth occlusion per view."""

    occ_center: np.ndarray = None
    occ_normal: np.ndarray = None
    occ_radius: float = 0.0

    def point_occlusion_matrix(self, pts: np.ndarray) -> np.ndarray:
        """(N, V) bool: does view v's ray to point p cross the occluder?

        The analytic per-(point, view) occlusion oracle — used by the r5
        occlusion-aware triplet sampler (train/train_pair.py): a patch of
        an occluded view at p's projection shows the DISK's texture, the
        exact appearance the pairnet must learn to score as non-matching.
        """
        pts = np.asarray(pts, np.float64)
        V = self.Ps.shape[0]
        out = np.zeros((len(pts), V), bool)
        for v in range(V):
            M = self.Ps[v][:, :3]
            cam = -np.linalg.solve(M, self.Ps[v][:, 3])
            d = pts - cam
            denom = d @ self.occ_normal
            safe = np.where(np.abs(denom) < 1e-9, np.inf, denom)
            t = ((self.occ_center - cam) @ self.occ_normal) / safe
            p = cam + t[:, None] * d
            out[:, v] = (
                (t > 0.0) & (t < 1.0)
                & (np.linalg.norm(p - self.occ_center, axis=-1)
                   < self.occ_radius)
            )
        return out

    def occluded_views(self) -> np.ndarray:
        """Views whose ray to the sphere center crosses the disk."""
        out = []
        for v in range(self.Ps.shape[0]):
            M = self.Ps[v][:, :3]
            cam = -np.linalg.solve(M, self.Ps[v][:, 3])
            d = self.center - cam
            denom = d @ self.occ_normal
            if abs(denom) < 1e-9:
                continue
            t = ((self.occ_center - cam) @ self.occ_normal) / denom
            if not 0.0 < t < 1.0:
                continue
            p = cam + t * d
            if np.linalg.norm(p - self.occ_center) < self.occ_radius:
                out.append(v)
        return np.asarray(out, int)


def make_occluded_scene(
    n_views: int = 12,
    hw: Tuple[int, int] = (120, 160),
    radius: float = 30.0,
    cam_dist: float = 120.0,
    focal: float = 200.0,
    occ_dist: float = 52.0,
    occ_radius: float = 55.0,
    specular: float = 0.35,
    seed: int = 0,
) -> "OccludedScene":
    """The anti-geometric golden scene (SURVEY.md C6: occlusion +
    specularity robustness of LEARNED pair weights).

    A textured sphere (the reconstruction target and the only surface in
    the eval GT / occupancy labels) ringed by cameras, plus a repeated-
    texture occluder disk at azimuth 0, OUTSIDE the sweep bbox, that
    blocks the sphere for the ~1/4 of views nearest +x: those views'
    CVCs sample occluder garbage for true-surface voxels, but no frustum
    or baseline-angle computation can know it — the geometric selector
    keeps fusing them, while a triplet-net similarity (whose probe
    patches in occluded views show the disk's tile pattern) can learn to
    exclude them.  A specular lobe on the sphere additionally breaks
    exact photoconsistency everywhere.
    """
    center = np.zeros(3)
    occ_dir = np.array([1.0, 0.0, 0.0])
    occ_center = center + occ_dist * occ_dir
    H, W = hw
    Ps = []
    images = []
    rng = np.random.default_rng(seed)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        elev = 0.35 + 0.1 * rng.standard_normal()
        eye = center + cam_dist * np.array(
            [
                np.cos(ang) * np.cos(elev),
                np.sin(ang) * np.cos(elev),
                np.sin(elev),
            ]
        )
        P = look_at_projection(
            eye, center, np.array([0.0, 0.0, 1.0]), focal, (W / 2, H / 2)
        )
        Ps.append(P)
        images.append(
            _trace_occluded_sphere(
                P, hw, center, radius,
                occ_center, -occ_dir, occ_radius, specular=specular,
            )
        )

    pad = radius * 0.35  # bbox excludes the occluder (occ_dist > r + pad)
    assert occ_dist > radius + pad
    return OccludedScene(
        images=np.stack(images),
        Ps=np.stack(Ps),
        bbox_min=center - radius - pad,
        bbox_max=center + radius + pad,
        center=center,
        radius=radius,
        occ_center=occ_center,
        occ_normal=-occ_dir,
        occ_radius=occ_radius,
    )


def make_sphere_scene(
    n_views: int = 8,
    hw: Tuple[int, int] = (120, 160),
    radius: float = 30.0,
    cam_dist: float = 120.0,
    focal: float = 200.0,
    seed: int = 0,
) -> SyntheticScene:
    """Ring of cameras looking at a textured sphere at the origin.

    Units are mm (DTU-like scale: sphere of 30 mm, cameras at 120 mm).
    """
    center = np.zeros(3)
    H, W = hw
    Ps = []
    images = []
    rng = np.random.default_rng(seed)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        elev = 0.35 + 0.1 * rng.standard_normal()
        eye = center + cam_dist * np.array(
            [
                np.cos(ang) * np.cos(elev),
                np.sin(ang) * np.cos(elev),
                np.sin(elev),
            ]
        )
        P = look_at_projection(
            eye, center, np.array([0.0, 0.0, 1.0]), focal, (W / 2, H / 2)
        )
        Ps.append(P)
        images.append(_trace_sphere(P, hw, center, radius))

    pad = radius * 0.4
    return SyntheticScene(
        images=np.stack(images),
        Ps=np.stack(Ps),
        bbox_min=center - radius - pad,
        bbox_max=center + radius + pad,
        center=center,
        radius=radius,
    )
