from spe_tpu.ops import boxes  # noqa: F401
from spe_tpu.ops import embeds  # noqa: F401
from spe_tpu.ops import losses  # noqa: F401
