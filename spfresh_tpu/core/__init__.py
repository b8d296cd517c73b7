from spfresh_tpu.core.dtypes import ACCUM_DTYPE, DEFAULT_POLICY, DtypePolicy, as_f32_np

__all__ = ["ACCUM_DTYPE", "DEFAULT_POLICY", "DtypePolicy", "as_f32_np"]
