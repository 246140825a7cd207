"""Image quality meters: PSNR / SSIM / LPIPS.

TPU-native equivalents of the reference meters (nerf/utils.py:206-314)
with the same clear/update/measure/write/report protocol. PSNR and
SSIM are computed in jnp (SSIM is the standard Gaussian-windowed
variant matching torchmetrics' defaults: 11x11 window, sigma 1.5,
k1=0.01, k2=0.03). LPIPS requires pretrained AlexNet weights that this
offline image cannot fetch — the meter is present for API parity and
raises with a clear message unless a weights path is supplied.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp



def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """SSIM over [H, W, C] images (mean over channels and positions).

    The window shrinks for images smaller than 11 px (a 'valid' conv
    would otherwise produce an empty output)."""
    size = min(11, pred.shape[0], pred.shape[1])
    if size % 2 == 0:
        size -= 1
    k = _gaussian_kernel(size=size, sigma=1.5)[:, :, None, None]  # HWIO

    def filt(img):
        # img: [H, W, C] -> depthwise gaussian blur, 'valid' padding
        x = img.astype(jnp.float32).transpose(2, 0, 1)[:, None]  # [C,1,H,W]
        out = jax.lax.conv_general_dilated(
            x, k.transpose(2, 3, 0, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            # TPU convs default to bf16 operands; the variance terms
            # below are differences of ~1.0-magnitude blurs vs
            # c2=9e-4 — bf16 noise (±4e-3) makes them wildly wrong
            # (measured SSIM "1.05-2.5" on v5e). Force f32.
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[:, 0].transpose(1, 2, 0)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred) - mu_p**2
    mu_tt = filt(target * target) - mu_t**2
    mu_pt = filt(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (mu_pp + mu_tt + c2)
    return jnp.mean(num / den)


class _MeterBase:
    def __init__(self):
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(f"{prefix}/{self.name()}", self.measure(), global_step)


class PSNRMeter(_MeterBase):
    def name(self):
        return "PSNR"

    def update(self, preds, truths):
        self.V += float(psnr(jnp.asarray(preds), jnp.asarray(truths)))
        self.N += 1

    def report(self):
        return f"PSNR = {self.measure():.6f}"


class SSIMMeter(_MeterBase):
    def name(self):
        return "SSIM"

    def update(self, preds, truths):
        p = jnp.asarray(preds)
        t = jnp.asarray(truths)
        if p.ndim == 4:  # [B, H, W, C]
            for i in range(p.shape[0]):
                self.V += float(ssim(p[i], t[i]))
                self.N += 1
        else:
            self.V += float(ssim(p, t))
            self.N += 1

    def report(self):
        return f"SSIM = {self.measure():.6f}"


class LPIPSMeter(_MeterBase):
    """LPIPS distance meter (reference nerf/utils.py:280-314), running a
    JAX AlexNet-LPIPS (ngp_tpu.training.lpips). Pretrained weights
    cannot be downloaded in this image (zero egress): pass a local
    ``weights_path`` (torch .pth — lpips package or torchvision+lins
    layout) or pre-converted ``params``; otherwise update() raises."""

    def __init__(self, net: str = "alex", weights_path: Optional[str] = None,
                 params=None):
        super().__init__()
        if net != "alex":
            raise ValueError("only the 'alex' backbone is implemented")
        self.net = net
        self.weights_path = weights_path
        self._params = params
        self._fn = None

    def name(self):
        return f"LPIPS ({self.net})"

    def _ensure(self):
        if self._fn is not None:
            return
        from ngp_tpu.training.lpips import load_torch_weights, lpips

        if self._params is None:
            if self.weights_path is None:
                raise RuntimeError(
                    "LPIPS requires pretrained perceptual-network weights; "
                    "provide weights_path= or params= to LPIPSMeter (no "
                    "network access in this image)."
                )
            self._params = load_torch_weights(self.weights_path)
        import jax

        self._fn = jax.jit(lambda x, y: lpips(self._params, x, y))

    def update(self, preds, truths):
        self._ensure()
        p = jnp.asarray(preds, jnp.float32)
        t = jnp.asarray(truths, jnp.float32)
        if p.ndim == 3:
            p, t = p[None], t[None]
        vals = self._fn(p, t)
        self.V += float(jnp.sum(vals))
        self.N += int(vals.shape[0])

    def report(self):
        return f"LPIPS ({self.net}) = {self.measure():.6f}"
