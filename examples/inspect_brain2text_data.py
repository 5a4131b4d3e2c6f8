"""Data-inspection walkthrough for the Brain-to-Text competition dataset.

Script equivalent of the reference's ``notebooks/brain2text_data.ipynb``
(SURVEY.md §4 "notebooks as harnesses"): load the .mat files, print shapes
and day/block indexing, build phoneme CTC labels, and plot a spike raster.

Usage:
  python examples/inspect_brain2text_data.py --data_dir data/competitionData
"""
from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llm_bci_tpu.data.speechbci import create_phonemes_ctc_labels, load_competition_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="data/competitionData")
    parser.add_argument("--vocab_file", default="vocab.json")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    dataset = load_competition_data(
        args.data_dir, zscore_block=True, zscore_day=True
    )
    for split, rows in dataset.items():
        print(f"split={split}: {len(rows)} examples")
    row = dataset["train"][0]
    print("spikes:", row["spikes"].shape, row["spikes"].dtype)
    print("sentence:", row["sentence"])
    print("day_idx:", int(row["day_idx"]), "block_idx:", int(row["block_idx"]))

    lengths = [r["spikes"].shape[0] for r in dataset["train"]]
    print(
        f"seq len: min={min(lengths)} max={max(lengths)} "
        f"mean={np.mean(lengths):.1f}"
    )

    dataset = create_phonemes_ctc_labels(dataset, args.vocab_file)
    print("phonemes:", dataset["train"][0]["phonemes"][:12], "...")
    print("phonemes_idx:", dataset["train"][0]["phonemes_idx"][:12], "...")

    if args.plot:
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 4))
        plt.imshow(row["spikes"].T, aspect="auto", cmap="viridis")
        plt.xlabel("time bin")
        plt.ylabel("channel")
        plt.title(row["sentence"][:60])
        plt.colorbar()
        plt.savefig("brain2text_raster.png", dpi=120)
        print("wrote brain2text_raster.png")


if __name__ == "__main__":
    main()
