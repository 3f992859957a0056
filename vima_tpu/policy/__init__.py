from vima_tpu.policy.vima import VIMAPolicy
from vima_tpu.policy.gato import VIMAGatoPolicy
from vima_tpu.policy.flamingo import VIMAFlamingoPolicy
from vima_tpu.policy.gpt import VIMAGPTPolicy

__all__ = ["VIMAPolicy", "VIMAGatoPolicy", "VIMAFlamingoPolicy", "VIMAGPTPolicy"]
