from v2ap_tpu.models.transformer import TriStreamTransformer, CrossCondition  # noqa: F401
from v2ap_tpu.models.cfm import CFM, CFMOutput, LossBreakdown                 # noqa: F401
from v2ap_tpu.models.video2roll import Video2RollNet                          # noqa: F401
