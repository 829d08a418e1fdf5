from v2ap_tpu.ops.norms import RMSNorm, AdaptiveRMSNorm, AdaLNZero, Identity  # noqa: F401
from v2ap_tpu.ops.rope import rope_table, apply_rope                          # noqa: F401
from v2ap_tpu.ops.fourier import RandomFourierEmbed, TimeCondMLP              # noqa: F401
from v2ap_tpu.ops.conv import DepthwiseConv1d                                 # noqa: F401
from v2ap_tpu.ops.feedforward import GLUFeedForward                           # noqa: F401
from v2ap_tpu.ops.attention import Attention                                  # noqa: F401
from v2ap_tpu.ops.flash_attention import (                                    # noqa: F401
    attention_reference,
    flash_attention,
)
from v2ap_tpu.ops.sampling import (                                           # noqa: F401
    sway_timesteps,
    euler_integrate,
    project_parallel,
    lens_to_mask,
    mask_from_frac_lengths,
)
