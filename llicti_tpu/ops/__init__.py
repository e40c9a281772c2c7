from .bounds import lower_bound
from .color import (
    rgb_int_to_ycocg_r_int,
    rgb_to_ycocg_r,
    ycocg_r_int_to_rgb_int,
    ycocg_r_to_rgb,
)
from .gmm import (
    cdf_float_to_uint16,
    cdf_sampling_points,
    gmm_cdf_table,
    gmm_self_information,
    standardized_cumulative,
)
from .wavelet import (
    band_coded_shape,
    interleave_bands,
    interleave_scale,
    lazy_dwt,
    pad_decoded_band,
    unpack_pad_flags,
)
