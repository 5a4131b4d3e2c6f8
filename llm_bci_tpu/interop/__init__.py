from llm_bci_tpu.interop.torch_import import (  # noqa: F401
    bci_params_from_torch,
    is_torch_checkpoint,
    itransformer_params_from_torch,
    load_saved_component_config,
    lora_params_from_peft_adapter,
    ndt1_encoder_params_from_torch,
    ndt1_params_from_torch,
    patchtst_variables_from_torch,
)
from llm_bci_tpu.interop.torch_export import (  # noqa: F401
    bci_save_reference_checkpoint,
    hf_llama_state_dict,
    itransformer_save_reference_checkpoint,
    ndt1_save_reference_checkpoint,
    patchtst_save_reference_checkpoint,
    save_hf_llama,
    save_peft_adapter,
)
