"""Train the LeNet FID feature extractor (parity: reference
scripts/train_lenet.py); fully offline given a cached dataset."""
from _common import ensure_dirs, setup_jax
from pdm_tpu.config.loader import with_config
from pdm_tpu.config.config import Config


@with_config(parse_args=(__name__ == "__main__"))
def main(config: Config) -> None:
    setup_jax()
    import jax
    import jax.numpy as jnp

    from pdm_tpu.models.lenet import save_lenet, train_lenet
    from pdm_tpu.utils.data import load_hf_images

    ensure_dirs("checkpoints")
    ds = config.dataset_config
    train_x, train_y = load_hf_images(
        ds.hf_dataset_name, ds.image_key, ds.image_size, ds.channels, "train"
    )
    test_x, test_y = load_hf_images(
        ds.hf_dataset_name, ds.image_key, ds.image_size, ds.channels, "test"
    )
    _, params = train_lenet(
        jax.random.PRNGKey(0),
        jnp.asarray(train_x), jnp.asarray(train_y),
        jnp.asarray(test_x), jnp.asarray(test_y),
    )
    out = f"checkpoints/lenet_{config.dataset_name}.npz"
    save_lenet(params, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
