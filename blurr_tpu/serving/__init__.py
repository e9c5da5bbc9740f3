from blurr_tpu.serving.client import ActionClient
from blurr_tpu.serving.server import ActionServer

__all__ = ["ActionServer", "ActionClient"]
