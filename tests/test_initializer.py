import jax.numpy as jnp
import numpy as np

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.frontend.initializer import CoarseInitializer
from nalo_slam_tpu.frontend.pixel_selector import PixelSelector, make_pixel_status
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.ops import build_pyramid
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib


def _pyr(img, levels):
    return build_pyramid(jnp.asarray(img), levels)


class TestPixelSelector:
    def test_select_density_and_types(self):
        calib = default_calib()
        scene = PlaneScene(calib)
        img, _ = scene.render(SE3())
        dIs, ags = _pyr(img, calib.levels)
        sel = PixelSelector(calib.w[0], calib.h[0], Settings())
        status = sel.make_maps(
            np.asarray(dIs[0]), [np.asarray(a) for a in ags], 1500.0, frame_id=0
        )
        n = (status != 0).sum()
        assert 300 < n < 6000, n
        assert set(np.unique(status)).issubset({0.0, 1.0, 2.0, 4.0})
        # border exclusion
        assert status[:4, :].sum() == 0 and status[:, :4].sum() == 0

    def test_make_pixel_status(self):
        calib = default_calib()
        scene = PlaneScene(calib)
        img, _ = scene.render(SE3())
        dIs, _ = _pyr(img, calib.levels)
        m, n = make_pixel_status(np.asarray(dIs[1]), 0.05 * 320 * 240)
        assert n == m.sum()
        assert n > 100

    def test_mask_fusion_promotes(self):
        s = Settings()
        sel = PixelSelector(64, 64, s)
        status = np.zeros((64, 64), np.float32)
        status[10, 10] = 2.0  # strong mask -> promote to 1
        status[20, 20] = 1.0  # weak mask region -> may demote
        mask = np.zeros((64, 64), np.float32)
        mask[10, 10] = 250.0
        mask[30:40, 30:40] = 100.0  # populate histogram
        out = sel.fuse_with_mask(status, mask)
        assert out[10, 10] in (1.0, 2.0)
        assert set(np.unique(out)).issubset({0.0, 1.0, 2.0})


class TestInitializer:
    def test_snap_and_structure(self):
        calib = default_calib(w=320, h=240)
        scene = PlaneScene(calib, z0=3.0)
        s = Settings()
        init = CoarseInitializer(calib, s)

        img0, id0 = scene.render(SE3())
        dIs0, ags0 = _pyr(img0, calib.levels)
        init.set_first(dIs0, ags0)
        assert init.pts[0]["n"] > 200

        done = False
        step = np.array([0.12, 0.0, 0.0, 0, 0, 0])
        for k in range(1, 10):
            pose = SE3.exp(step * k)  # camToWorld
            img, _ = scene.render(pose)
            dIs, _ = _pyr(img, calib.levels)
            done = init.track_frame(dIs)
            if done:
                break
        assert init.snapped, "initializer never snapped with 1.2m of translation"
        assert done, "did not finish after snap+5 frames"

        # structure: plane at constant z -> all idepths equal up to scale;
        # check relative spread of recovered idepths on good points
        d = init.pts[0]
        g = d["is_good"][: d["n"]]
        idp = d["idepth"][: d["n"]][g]
        assert len(idp) > 100
        rel_spread = np.std(idp) / np.mean(idp)
        assert rel_spread < 0.1, f"idepth spread {rel_spread}"

        # translation direction ~ -x in the ref frame (refToNew = inv motion)
        t = init.this_to_next.t
        assert abs(t[0]) > 5 * (abs(t[1]) + abs(t[2])), t
        assert t[0] < 0
