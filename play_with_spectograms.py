"""Exploration playground: classify positive vs negative spectrogram frames
with a frame-level SVM (reference: Classical_methods/play_with_spectograms.py).

Loads a preprocessed spectrogram dataset, gathers event/empty frame columns,
balances them, and reports held-out SVM accuracy.
"""

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", type=str, default="../data")
    parser.add_argument("--val_descriptor", type=float, default=0.2)
    parser.add_argument("--holdout", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from sed_tpu.data.spectrogram_dataset import (
        SpectrogramDataset,
        preprocess_film_clap_data,
    )

    features_dir, mean_std_file = preprocess_film_clap_data(
        args.dataset_dir, preprocessed_mode="logMel", force_preprocess=False
    )
    dataset = SpectrogramDataset(
        features_dir, mean_std_file,
        augment_data=False, balance_classes=False,
        val_descriptor=args.val_descriptor, preprocessed_mode="logMel",
        seed=args.seed,
    )

    pos_frames, neg_frames = [], []
    for idx in dataset.train_start_indices:
        features = dataset.train_features[0, idx]
        label = dataset.train_event_matrix[idx, 0]
        (pos_frames if label else neg_frames).append(features)
    pos_frames = np.array(pos_frames)
    neg_frames = np.array(neg_frames)
    rng = np.random.default_rng(args.seed)
    neg_frames = neg_frames[rng.integers(len(neg_frames), size=len(pos_frames))]

    labels = np.zeros(len(pos_frames) + len(neg_frames))
    labels[: len(pos_frames)] = 1
    data = np.concatenate((pos_frames, neg_frames), axis=0)
    order = rng.permutation(len(data))
    data, labels = data[order], labels[order]

    print("Classifying")
    from sklearn import svm

    classifier = svm.SVC(C=1, kernel="rbf")
    n = args.holdout
    classifier.fit(data[:-n], labels[:-n])
    predictions = classifier.predict(data[-n:])
    accuracy = np.mean(predictions == labels[-n:])
    print(f"held-out accuracy: {accuracy}")


if __name__ == "__main__":
    main()
