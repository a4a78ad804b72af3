"""Pallas TPU kernels: the fused EGA radiative-transfer kernel
(the TPU-native equivalent of jr_fusion_kernel.mv4g.cu)."""
from .ega_fused import (PallasTables, build_pallas_tables, pack_continua,
                        rt_fused_pallas)

__all__ = ["PallasTables", "build_pallas_tables", "pack_continua",
           "rt_fused_pallas"]
