"""speech_cloner_tpu — a TPU-native (JAX/XLA/Pallas/pjit) voice-cloning framework.

A from-scratch rebuild of the capabilities of socom20/speech-cloner (PPG voice
conversion: MFCC front-end -> TIMIT phoneme-posterior encoder -> target-speaker
spectrogram decoder -> Griffin-Lim vocoder), designed TPU-first:

- all DSP (pre-emphasis, STFT, mel, MFCC, dB maps, Griffin-Lim) runs on device
  as jit-compiled JAX (reference ran librosa on host CPU: audio_lib.py:89-308),
- models are pure-function param pytrees compiled with jit/pjit,
- training/inference scale over a `jax.sharding.Mesh` (data/model/seq axes),
- weights are importable from the reference's shipped TF checkpoints.

Package layout (see SURVEY.md §7):
  ops/      device DSP kernels           (reference: audio_lib.py)
  nn/       NN module library            (reference: modules.py)
  models/   encoder / decoder / spk-id   (reference: encoder.py decoder.py voice_identification.py)
  data/     dataset readers + samplers   (reference: sound_ds.py *_reader.py)
  train/    jitted train loops           (reference: encoder.py:300 decoder.py:379)
  parallel/ mesh + sharding + collectives (no reference equivalent; single-device)
  runtime/  checkpoint, config, metrics  (reference: aux_func.py clean_ckpt.py TF Saver)
  pipeline/ end-to-end clone             (reference: test.py)
"""

__version__ = "0.1.0"
