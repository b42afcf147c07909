"""MP-mask inference: batch depth prediction + online mask source.

Rebuild of mp_mask/pytorch/bts_test_my.py (batch inference -> 16-bit
depth-PNG x256, :160-169) plus the fused online path SURVEY.md §7 phase 6
plans: MaskPredictor turns a SLAM frame into the mask prior on-device, so
the runtime needs no pre-rendered PNGs (the PNG path stays for parity).

Checkpointing uses orbax (reference: torch.save step-indexed checkpoints,
bts_my.py:294-306).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .bts import BtsConfig, BtsModel
from .data import depth_to_mask, normalize, save_depth_png


def save_checkpoint(path: str, params, batch_stats, step: int = 0):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(os.path.join(path, f"step_{step}")),
              dict(params=params, batch_stats=batch_stats))
    ckpt.wait_until_finished()


def load_checkpoint(path: str, step: int = 0):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(os.path.join(path, f"step_{step}")))


class MaskPredictor:
    """Runs the BTS net on grayscale SLAM frames to produce the MP-mask
    prior image (0..255, near geometry high)."""

    def __init__(self, cfg: BtsConfig, variables, pad_to: int = 32):
        self.cfg = cfg
        self.model = BtsModel(cfg)
        self.variables = variables
        self.pad_to = pad_to

        @jax.jit
        def _run(variables, x):
            *_, final = self.model.apply(variables, x, train=False)
            return final[..., 0] * cfg.max_depth

        self._run = _run

    @staticmethod
    def init(cfg: BtsConfig, input_hw, seed: int = 0, pad_to: int = 32) -> "MaskPredictor":
        model = BtsModel(cfg)
        h, w = input_hw
        # the encoder/decoder ladder needs dims divisible by 32
        h = ((h + pad_to - 1) // pad_to) * pad_to
        w = ((w + pad_to - 1) // pad_to) * pad_to
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3), jnp.float32),
            train=False,
        )
        return MaskPredictor(cfg, variables, pad_to)

    def predict_depth(self, image_gray: np.ndarray) -> np.ndarray:
        """(H, W) intensity in [0,255] -> (H, W) metric depth."""
        h, w = image_gray.shape
        ph = (self.pad_to - h % self.pad_to) % self.pad_to
        pw = (self.pad_to - w % self.pad_to) % self.pad_to
        rgb = np.repeat(image_gray[..., None], 3, -1).astype(np.float32)
        x = normalize(rgb)
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
        d = np.asarray(self._run(self.variables, jnp.asarray(x[None])))[0]
        return d[:h, :w]

    def predict_mask(self, image_gray: np.ndarray) -> np.ndarray:
        return depth_to_mask(self.predict_depth(image_gray),
                             max_depth=self.cfg.max_depth)


def export_depth_pngs(predictor: MaskPredictor, images, out_dir: str):
    """Batch inference to KITTI-convention depth PNGs (bts_test_my.py)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, img in enumerate(images):
        d = predictor.predict_depth(np.asarray(img))
        p = os.path.join(out_dir, f"{i:010d}.png")
        save_depth_png(p, d)
        paths.append(p)
    return paths
