"""Config composition tests: defaults-list merge, @package _global_,
interpolation, CLI group + dotted overrides (the Hydra subset the reference
relies on, SURVEY.md §5 config system)."""

import pytest

from feartracker_tpu.config.compose import load_config


def test_default_composition():
    cfg = load_config("fear_tracker")
    # group-packaged
    assert cfg["tracker"]["instance_size"] == 256
    assert cfg["optimizer"]["name"] == "adam"
    assert cfg["scheduler"]["mode"] == "max"
    # @package _global_ groups merge at root
    assert cfg["batch_size"]["train"] == 128
    assert cfg["platform"] == ""
    assert cfg["experiment"]["name"] == "FEAR"


def test_interpolation_resolves_to_typed_values():
    cfg = load_config("fear_tracker")
    sizes = cfg["sizes"]
    assert sizes["search_image_size"] == 256  # ${tracker.instance_size}, int
    assert sizes["template_bbox_offset"] == 0.2
    ds = cfg["train"]["datasets"][0]
    assert ds["sampling"]["frame_offset"] == 70
    assert ds["sampling"]["data_path"].startswith("/data/fear/")
    assert ds["sizes"]["search_image_size"] == 256  # nested ${sizes}


def test_group_override():
    cfg = load_config("fear_tracker", overrides=["backend=cpu", "optimizer=sgd"])
    assert cfg["platform"] == "cpu"
    assert cfg["num_devices"] == 1
    assert cfg["optimizer"]["name"] == "sgd"
    assert cfg["optimizer"]["momentum"] == 0.9


def test_multihost_backend_composes():
    cfg = load_config("fear_tracker", overrides=["backend=tpu_pod"])
    assert cfg["distributed"]["enabled"] is True
    assert cfg["num_devices"] == 0  # 0 = every chip jax.distributed exposes
    assert cfg["sync_bn"] is True


def test_dotted_value_override():
    cfg = load_config(
        "fear_tracker",
        overrides=["batch_size.train=16", "tracker.instance_size=128", "max_epochs=2"],
    )
    assert cfg["batch_size"]["train"] == 16
    assert cfg["max_epochs"] == 2
    # interpolation picks up the override
    assert cfg["sizes"]["search_image_size"] == 128


def test_utility_overrides_local_fast():
    cfg = load_config("fear_tracker", overrides=["utility_overrides=local_fast"])
    assert cfg["local_run"] is True
    assert cfg["max_epochs"] == 1
    assert cfg["batch_size"] == 2


def test_full_train_has_five_datasets():
    cfg = load_config("fear_tracker", overrides=["dataset=full_train"])
    assert len(cfg["train"]["datasets"]) == 5
    assert cfg["negative_ratio"] == 1


def test_unknown_interpolation_raises():
    with pytest.raises(KeyError):
        load_config("fear_tracker", overrides=["sizes.bogus=${does.not.exist}"])


def test_list_index_override():
    cfg = load_config(
        "fear_tracker",
        overrides=[
            "train.datasets.0.root=/tmp/other",
            "train.datasets.0.sampling.num_samples=7",
            "val.datasets.0.root_dir=/tmp/val",
        ],
    )
    assert cfg["train"]["datasets"][0]["root"] == "/tmp/other"
    assert cfg["train"]["datasets"][0]["sampling"]["num_samples"] == 7
    assert cfg["val"]["datasets"][0]["root_dir"] == "/tmp/val"
