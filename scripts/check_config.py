"""Config-parse smoke test (parity: reference scripts/check_config.py)."""
from _common import setup_jax  # noqa: F401
from pdm_tpu.config.loader import load_config

if __name__ == "__main__":
    config = load_config()
    print(f"config OK: experiment={config.experiment_name}")
