from avatarcraft_tpu.ops.hash_encoder import HashGridSpec, hash_encode, init_hash_table
from avatarcraft_tpu.ops.sh_encoder import sh_encode
from avatarcraft_tpu.ops.freq_encoder import freq_encode, freq_encode_dim
from avatarcraft_tpu.ops.sampling import (
    sample_pdf,
    near_far_from_bound,
    stratified_z_vals,
)

__all__ = [
    "HashGridSpec",
    "hash_encode",
    "init_hash_table",
    "sh_encode",
    "freq_encode",
    "freq_encode_dim",
    "sample_pdf",
    "near_far_from_bound",
    "stratified_z_vals",
]
