"""Device-side ops: DCT basis, fused QIM/DCT embed & extract kernels."""

from stegotpu.ops.qim import embed_frames, extract_frames  # noqa: F401
from stegotpu.ops.dct import dct_matrix, kron_dct_matrix  # noqa: F401
