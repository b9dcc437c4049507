"""CLI apps (reference L4 entry points: encoder.py/decoder.py __main__,
test.py, voice_identification.py, clean_ckpt.py, mp3converter.sh)."""
