# Model modules register themselves into llm_bci_tpu.registry.NAME2MODEL on
# import.
from llm_bci_tpu.models import ndt1  # noqa: F401
from llm_bci_tpu.models import itransformer  # noqa: F401
from llm_bci_tpu.models import patchtst  # noqa: F401
from llm_bci_tpu.models import bci  # noqa: F401
from llm_bci_tpu.models import phoneme_llm  # noqa: F401
from llm_bci_tpu.models.ndt1 import NDT1  # noqa: F401
from llm_bci_tpu.models.itransformer import iTransformer  # noqa: F401
from llm_bci_tpu.models.patchtst import PatchTSTForSpikingActivity  # noqa: F401
from llm_bci_tpu.models.bci import BCI  # noqa: F401
