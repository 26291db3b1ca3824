from .dataset import (AudioDataset, DataLoader, LazyAudioDataset,
                      RandomBackgroundNoise, preprocess, split_dataset)
