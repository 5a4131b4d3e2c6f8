from llm_bci_tpu.interop.torch_import import (  # noqa: F401
    bci_params_from_torch,
    is_torch_checkpoint,
    itransformer_params_from_torch,
    lora_params_from_peft_adapter,
    ndt1_encoder_params_from_torch,
    ndt1_params_from_torch,
    patchtst_variables_from_torch,
)
