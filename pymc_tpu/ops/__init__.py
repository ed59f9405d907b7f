from . import pallas_kernels
from .special import bessel_iv, bessel_kv

__all__ = ["pallas_kernels", "bessel_iv", "bessel_kv"]
