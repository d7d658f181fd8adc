from herald_tpu.launch.cli import main, run_training
