from deepsir_tpu.models.randla import RandLA  # noqa: F401
from deepsir_tpu.models.network import Network, ForwardOptions  # noqa: F401
