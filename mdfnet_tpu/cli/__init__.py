"""Command-line entry points: python -m mdfnet_tpu.cli.eval / .fuse / .dtu_eval
(training lives at python -m mdfnet_tpu.train)."""
