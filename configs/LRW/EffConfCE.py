# LRW 500-word visual classification.
# Parity target: /root/reference/configs/LRW/EffConfCE.py
import os

import avec_tpu as nnet

# Architecture
vocab_size = 500

# Training
batch_size = 32
accumulated_steps = 2
precision = "bfloat16"
callback_path = "callbacks/LRW/EffConfCE"

# Model
model = nnet.VisualEfficientConformerCE(vocab_size=vocab_size)
model.compile()

# Datasets
collate_fn = nnet.CollateFn(inputs_params=[{"axis": 0}],
                            targets_params=[{"axis": 1}])
crop_size = (88, 88)
training_video_transform = nnet.Compose([
    nnet.RandomCrop(crop_size),
    nnet.RandomHorizontalFlip(),
    nnet.TimeMaskSecond(T_second=0.4, num_mask_second=1.0, fps=25.0,
                        mean_frame=True),
])
evaluation_video_transform = nnet.CenterCrop(crop_size)

if os.path.isdir("datasets/LRW"):
    training_dataset = nnet.datasets.LRW(
        batch_size=batch_size, collate_fn=collate_fn, mode="train",
        video_transform=training_video_transform)
    evaluation_dataset = nnet.datasets.LRW(
        batch_size=batch_size, collate_fn=collate_fn, mode="val",
        video_transform=evaluation_video_transform)
else:
    training_dataset = nnet.datasets.SyntheticClassificationDataset(
        num_samples=256, num_classes=vocab_size, batch_size=batch_size,
        collate_fn=collate_fn)
    evaluation_dataset = nnet.datasets.SyntheticClassificationDataset(
        num_samples=64, num_classes=vocab_size, batch_size=batch_size,
        collate_fn=collate_fn, seed=123)
