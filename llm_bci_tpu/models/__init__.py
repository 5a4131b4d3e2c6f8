# Model modules register themselves into llm_bci_tpu.registry.NAME2MODEL on
# import; llm_bci_tpu.training.trainer imports them lazily.
