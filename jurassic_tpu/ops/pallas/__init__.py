"""Pallas TPU kernels: the fused EGA radiative-transfer kernel
(the TPU-native equivalent of jr_fusion_kernel.mv4g.cu) and its
Chebyshev-compressed turbo variant."""
from .ega_fused import (PallasTables, build_pallas_tables, pack_continua,
                        rt_fused_pallas)
from .turbo_fit import TurboStats, build_turbo_tables

__all__ = ["PallasTables", "build_pallas_tables", "pack_continua",
           "rt_fused_pallas", "TurboStats", "build_turbo_tables"]
