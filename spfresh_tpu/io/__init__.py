from spfresh_tpu.io.vecs import (
    read_bvecs,
    read_fvecs,
    read_ivecs,
    write_fvecs,
    write_ivecs,
)

__all__ = ["read_bvecs", "read_fvecs", "read_ivecs", "write_fvecs", "write_ivecs"]
