"""Heightfield patch-serving correctness (CPU, no Pallas).

The megakernel reads per-foot PxP height patches that the host wrapper
gathers from a WIN-aligned tile table (megakernel.py `_tile_table` +
`megakernel_step_batched`). The kernel clamps vertex lookups to the patch,
so any vertex landing outside the window would silently read a wrong
height — these tests pin (a) the tile table against the raw heightfield,
(b) the patch-origin arithmetic's guaranteed margins vs the foot's real
reach, and (c) bilinear heights served through the tile path vs a direct
full-field lookup.
"""

import numpy as np
import pytest

from open_duck_playground_tpu.physics import megakernel as MK


def _fake_hf(nrow=64, ncol=64, dxh=0.08, dyh=0.08):
    return dict(
        x0w=-2.0,
        y0w=-2.0,
        zw=0.0,
        zscale=1.0,
        dxh=dxh,
        dyh=dyh,
        ncol=ncol,
        nrow=nrow,
        P=MK.HFIELD_P,
        win=MK.HFIELD_WIN,
        koff=MK.HFIELD_KOFF,
        tiled=True,
        foot_site=(0,),
    )


class _FakeSpec:
    pass


def _tile_table_np(hd, hf):
    """Reference tile table (mirrors _tile_table, plain numpy)."""
    nrow, ncol = hf["nrow"], hf["ncol"]
    WIN, P = hf["win"], hf["P"]
    ntj = (nrow + WIN - 1) // WIN
    nti = (ncol + WIN - 1) // WIN
    tab = np.zeros((ntj * nti, P * P), np.float32)
    for a in range(ntj):
        sj = min(WIN * a, nrow - P)
        for b in range(nti):
            si = min(WIN * b, ncol - P)
            tab[a * nti + b] = hd[sj : sj + P, si : si + P].reshape(-1)
    return tab, nti


def _origin(g, hi, hf):
    """Patch origin for a foot-center grid coordinate g (mirrors
    megakernel_step_batched's tiled-path arithmetic)."""
    WIN, P = hf["win"], hf["P"]
    i0 = np.clip(np.floor(g).astype(int) - hf["koff"], 0, hi - WIN)
    ti = i0 // WIN
    si = np.minimum(WIN * ti, hi - P)
    return ti, si


def test_tile_table_serves_exact_hfield_windows():
    hf = _fake_hf()
    rng = np.random.default_rng(0)
    hd = rng.normal(size=(hf["nrow"], hf["ncol"])).astype(np.float32)
    tab, nti = _tile_table_np(hd, hf)
    P, WIN = hf["P"], hf["win"]
    for _ in range(200):
        gx = rng.uniform(0, hf["ncol"] - 1)
        gy = rng.uniform(0, hf["nrow"] - 1)
        ti, si = _origin(np.asarray(gx), hf["ncol"], hf)
        tj, sj = _origin(np.asarray(gy), hf["nrow"], hf)
        patch = tab[tj * nti + ti].reshape(P, P)
        np.testing.assert_array_equal(patch, hd[sj : sj + P, si : si + P])


def test_patch_margins_cover_guarantee():
    """For any in-bounds foot center, the patch must reach >= KOFF cells
    left/below and >= P-2-(KOFF+WIN-1) cells right/above of the center cell
    (the margin guarantee the build-time reach assertion relies on)."""
    hf = _fake_hf()
    P, WIN, K = hf["P"], hf["win"], hf["koff"]
    right_marg = P - 2 - (K + WIN - 1)
    assert right_marg >= 2, "patch constants must give >=2-cell right margin"
    rng = np.random.default_rng(1)
    # stay >= P cells from the hfield edge (the duck's 256-cell fields are
    # 20 m wide; edge-clamped behavior is the same as the old design's)
    for _ in range(500):
        gx = rng.uniform(P, hf["ncol"] - 1 - P)
        c = int(np.floor(gx))
        _, si = _origin(np.asarray(gx), hf["ncol"], hf)
        assert c - si >= K, (gx, c, si)
        # bilinear reads column idx+1, hence P-2 usable to the right
        assert (si + P - 2) - c >= right_marg, (gx, c, si)


def test_margin_exceeds_duck_foot_reach():
    """The real duck foot's reach (hull radius from the patch-center site +
    per-step drift) must fit the guaranteed margin — this is the geometric
    fact that makes HFIELD_P=8 safe (measured max |vert-site| = 6.8 cm,
    cell = 7.8 cm on the duck's rough scenes)."""
    from open_duck_playground_tpu.envs import duck_base
    from open_duck_playground_tpu.models import loader

    m, mj = loader.load_model(
        duck_base.TASKS["rough_terrain_backlash"], timestep=0.002
    )
    s = m.spec
    assert s.floor_is_hfield
    hsz = np.asarray(mj.hfield_size[0])
    dxh = 2 * hsz[0] / (mj.hfield_ncol[0] - 1)
    reach = 0.0
    for fi, gid in enumerate(s.collide_geom_ids):
        b = s.geom_bodyid[gid]
        sites = [i for i, sb in enumerate(s.site_bodyid) if sb == b]
        hull = np.asarray(m.foot_hull)[fi]  # (hull_nvert, 3)
        assert hull.shape[0] == s.hull_nvert and hull.shape[0] > 0
        w, x, y, z = np.asarray(m.geom_quat[gid], np.float64)
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        vb = hull @ R.T + np.asarray(m.geom_pos[gid], np.float64)
        sp = np.asarray(m.site_pos[sites[0]], np.float64)
        reach = max(reach, float(np.linalg.norm(vb - sp, axis=1).max()))
    min_margin_cells = min(
        MK.HFIELD_KOFF, MK.HFIELD_P - 2 - (MK.HFIELD_KOFF + MK.HFIELD_WIN - 1)
    )
    # 4 cm drift allowance per control step (pushes kick <= 1 m/s * 20 ms,
    # plus walking translation); same number the kernel build asserts
    assert reach + 0.04 <= min_margin_cells * dxh, (reach, dxh)


def test_bilinear_height_through_tile_path_matches_full_field():
    """End-to-end host-side check: origin arithmetic + tile gather +
    triangle-bilinear interpolation == the same interpolation on the raw
    field, for vertices within the guaranteed margins."""
    hf = _fake_hf()
    P = hf["P"]
    rng = np.random.default_rng(2)
    hd = rng.normal(size=(hf["nrow"], hf["ncol"])).astype(np.float32)
    tab, nti = _tile_table_np(hd, hf)

    def tri_height(field, fx, fy, ox=0, oy=0):
        fx, fy = fx - ox, fy - oy
        iw, jw = int(fx), int(fy)
        u, v = fx - iw, fy - jw
        z00, z10 = field[jw, iw], field[jw, iw + 1]
        z01, z11 = field[jw + 1, iw], field[jw + 1, iw + 1]
        if u + v <= 1.0:
            return z00 + u * (z10 - z00) + v * (z01 - z00)
        return z11 + (1 - u) * (z01 - z11) + (1 - v) * (z10 - z11)

    for _ in range(300):
        gx = rng.uniform(P, hf["ncol"] - 1 - P)
        gy = rng.uniform(P, hf["nrow"] - 1 - P)
        ti, si = _origin(np.asarray(gx), hf["ncol"], hf)
        tj, sj = _origin(np.asarray(gy), hf["nrow"], hf)
        patch = tab[tj * nti + ti].reshape(P, P)
        # a vertex within the guaranteed margins of the center
        vx = gx + rng.uniform(-hf["koff"], hf["koff"])
        vy = gy + rng.uniform(-hf["koff"], hf["koff"])
        got = tri_height(patch, vx, vy, ox=si, oy=sj)
        want = tri_height(hd, vx, vy)
        # last-ulp differences from the (fx - origin) subtraction order are
        # inherent to windowed lookup; anything larger is a real bug
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
