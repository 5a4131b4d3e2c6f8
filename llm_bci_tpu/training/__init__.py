from llm_bci_tpu.training.trainer import Trainer, TrainState, default_trainer_config  # noqa: F401
