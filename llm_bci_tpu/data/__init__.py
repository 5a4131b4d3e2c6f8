from llm_bci_tpu.data.datasets import (
    SpikingDataset,
    SpikingDatasetForDecoding,
    DaySpecificSpikingDatasetForDecoding,
    padded_array,
    pad_collate_fn,
)
