"""CLI entry points mirroring the reference's root scripts
(train_asr.py / train_vad.py / train_punc.py / eval_am.py / test_asr.py):
every command takes ``--data_config`` and ``--model_config`` YAML paths
(utils/user_config.py UX)."""
