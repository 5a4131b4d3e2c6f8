from llm_bci_tpu.ops.ctc import ctc_loss
from llm_bci_tpu.ops.losses import poisson_nll_loss, mse_loss, cross_entropy_loss
from llm_bci_tpu.ops.smoothing import gaussian_kernel, smooth_spikes
from llm_bci_tpu.ops.context import create_context_mask
from llm_bci_tpu.ops.rotary import rope_cos_sin, apply_rotary_pos_emb
from llm_bci_tpu.ops.attention import dot_product_attention, make_attention_mask
from llm_bci_tpu.ops.flash_attention import banded_flash_attention
from llm_bci_tpu.ops.ctc_pallas import ctc_loss_pallas
