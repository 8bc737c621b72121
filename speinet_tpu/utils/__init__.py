from speinet_tpu.utils.logging import Logger
from speinet_tpu.utils.checkpoint import CheckpointManager
