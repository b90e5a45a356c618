"""Unit tests for the Hydra-like composer (config/compose.py).

The reference's composition grammar (reference: configs/default.yaml:1-9 +
run.py:15-16): defaults lists, group re-selection, dotted value overrides,
+new keys, group-local nested defaults.
"""

import os

import pytest

from anomaly_detection_on_video_tpu.config.compose import compose


def write(root, rel, text):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture
def tree(tmp_path):
    root = str(tmp_path)
    write(root, "default.yaml",
          "defaults:\n  - data: base\n  - trainer: base\n  - _self_\nseed: 0\n")
    write(root, "data/base.yaml", "batch_size: 16\npath: /a\n")
    write(root, "data/alt.yaml", "batch_size: 4\npath: /b\n")
    write(root, "trainer/base.yaml",
          "defaults:\n  - {logger: wandb}\n  - callbacks\nmax_epochs: 10\n")
    write(root, "trainer/logger/wandb.yaml", "project: demo\nlog_model: true\n")
    write(root, "trainer/callbacks.yaml", "monitor: auc\n")
    return root


def test_group_composition_and_self(tree):
    cfg = compose(tree, "default", [])
    assert cfg["seed"] == 0
    assert cfg["data"]["batch_size"] == 16
    assert cfg["trainer"]["max_epochs"] == 10


def test_nested_dict_defaults_nest_under_subgroup(tree):
    """{logger: wandb} inside trainer/base.yaml must land at
    trainer.logger.* (Hydra semantics), not merge flat."""
    cfg = compose(tree, "default", [])
    assert cfg["trainer"]["logger"] == {"project": "demo", "log_model": True}
    # plain string entries merge flat (group-local siblings)
    assert cfg["trainer"]["monitor"] == "auc"


def test_group_reselect_and_value_overrides(tree):
    cfg = compose(tree, "default", ["data=alt", "trainer.max_epochs=3"])
    assert cfg["data"]["path"] == "/b"
    assert cfg["trainer"]["max_epochs"] == 3
    assert cfg["_choices_"]["data"] == "alt"


def test_yaml_typed_values_and_new_keys(tree):
    cfg = compose(tree, "default", ["data.batch_size=1e-3", "+extra.k=[1,2]"])
    assert cfg["data"]["batch_size"] == pytest.approx(1e-3)
    assert cfg["extra"]["k"] == [1, 2]


def test_unknown_override_key_errors(tree):
    with pytest.raises(KeyError, match="does not exist"):
        compose(tree, "default", ["data.nope=1"])


def test_unknown_group_choice_errors(tree):
    with pytest.raises(FileNotFoundError, match="available"):
        compose(tree, "default", ["data=missing"])


def test_root_scalar_override(tree):
    """Dot-free keys that do not name a config-group directory are root value
    overrides, not group selections (Hydra behavior; reference run.py:9-12
    documents `wandb_key=KEY` as the W&B enable path)."""
    cfg = compose(tree, "default", ["seed=1"])
    assert cfg["seed"] == 1
    # still errors helpfully for unknown root keys
    with pytest.raises(KeyError, match="does not exist"):
        compose(tree, "default", ["sede=1"])


def test_root_scalar_override_on_repo_configs():
    """CLI-level check against the real configs/ tree: the reference's
    documented `wandb_key=KEY` and `seed=N` overrides must compose."""
    repo_configs = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose(repo_configs, "default", ["runner=mgfn", "seed=7", "wandb_key=abc"])
    assert cfg["seed"] == 7
    assert cfg["wandb_key"] == "abc"
    assert cfg["runner"]["model_class"]


def test_reference_num_workers_override_composes():
    """`data.num_workers=N` from a copy-pasted reference command must
    compose (reference: configs/data/default.yaml:3). N >= 1 enables the
    background batch-prefetch thread; 0 is synchronous (torch spirit)."""
    repo_configs = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = compose(repo_configs, "default", ["runner=mgfn", "data.num_workers=4"])
    assert cfg["data"]["num_workers"] == 4
    assert compose(repo_configs, "default", [])["data"]["num_workers"] == 8


def test_quoted_string_values_stay_strings(tree):
    """Explicitly quoted tokens must not be float-coerced (Hydra preserves
    quoted strings): +extra.k='1e-3' stays the string '1e-3'."""
    cfg = compose(tree, "default", ['+extra.k="1e-3"', "+extra.w=nan"])
    assert cfg["extra"]["k"] == "1e-3"
    assert cfg["extra"]["w"] == "nan"  # bare words stay strings too
    # unquoted scientific notation is still a float
    cfg = compose(tree, "default", ["+extra.lr=2.5e-4"])
    assert cfg["extra"]["lr"] == pytest.approx(2.5e-4)


def test_plus_prefixed_group_selects_instead_of_clobbering(tree):
    """Hydra's '+group=choice' adds a group to the defaults; it must select
    the group, not replace the composed group dict with a bare string
    (previously '+data=alt' set cfg['data'] = 'alt')."""
    cfg = compose(tree, "default", ["+data=alt"])
    assert cfg["data"]["path"] == "/b"
    assert cfg["_choices_"]["data"] == "alt"
    # '+' still adds genuinely new (non-group) keys
    cfg = compose(tree, "default", ["+wandb_key=abc"])
    assert cfg["wandb_key"] == "abc"


def test_tilde_deletes_value_keys(tree):
    """Hydra's '~key' delete grammar: '~a.b' removes the key; '~a.b=value'
    requires the current value to match before deleting."""
    cfg = compose(tree, "default", ["~data.path"])
    assert "path" not in cfg["data"]
    cfg = compose(tree, "default", ["~seed"])  # root scalar
    assert "seed" not in cfg
    cfg = compose(tree, "default", ["~data.batch_size=16"])  # matching value
    assert "batch_size" not in cfg["data"]
    with pytest.raises(ValueError, match="current value"):
        compose(tree, "default", ["~data.batch_size=99"])
    with pytest.raises(KeyError, match="not in config"):
        compose(tree, "default", ["~data.nope"])
    with pytest.raises(ValueError, match="cannot combine"):
        compose(tree, "default", ["~+data.path"])


def test_tilde_deletes_groups(tree):
    """'~group' drops the group from the defaults list entirely."""
    cfg = compose(tree, "default", ["~data"])
    assert "data" not in cfg
    assert "data" not in cfg["_choices_"]
    assert cfg["trainer"]["max_epochs"] == 10  # others unaffected


def test_plus_on_existing_key_errors_and_plusplus_forces(tree):
    """Hydra's append grammar: '+key=v' errors when the key already exists
    (pointing at the '++' form); '++key=v' adds-or-overrides either way."""
    with pytest.raises(KeyError, match=r"already at.*\+\+"):
        compose(tree, "default", ["+data.batch_size=4"])
    cfg = compose(tree, "default", ["++data.batch_size=4", "++extra.k=1"])
    assert cfg["data"]["batch_size"] == 4  # existing key overridden
    assert cfg["extra"]["k"] == 1  # new key added
    with pytest.raises(ValueError, match="at most two"):
        compose(tree, "default", ["+++data.batch_size=4"])


def test_interpolation_dotted_path_and_typing(tree):
    """${a.b} resolves against the final composed config; a value that is
    exactly one interpolation keeps the referenced type (OmegaConf), and
    embedded interpolations stringify."""
    cfg = compose(
        tree, "default",
        ["+extra.bs=${data.batch_size}", "+extra.name=run-${data.batch_size}",
         "data.batch_size=32"],
    )
    assert cfg["extra"]["bs"] == 32  # int, post-override value
    assert cfg["extra"]["name"] == "run-32"


def test_interpolation_in_config_files(tree):
    """Interpolations written in YAML files resolve too (Hydra configs do
    this routinely); \\${ escapes a literal."""
    write(tree, "data/interp.yaml",
          "batch_size: 8\npath: /a\nlabel: bs${batch_size}\n")
    # relative-to-group names are not a thing here: absolute path from root
    write(tree, "data/interp2.yaml",
          "batch_size: 8\npath: /a\nlabel: bs-${data.batch_size}\n"
          'literal: "\\\\${not.an.interp}"\n')
    cfg = compose(tree, "default", ["data=interp2"])
    assert cfg["data"]["label"] == "bs-8"
    assert cfg["data"]["literal"] == "${not.an.interp}"


def test_interpolation_choices_and_now_resolvers(tree):
    """The reference's W&B run-name grammar (configs/trainer/logger/
    wandb.yaml:3): ${hydra:runtime.choices.<group>} and ${now:<fmt>}."""
    cfg = compose(
        tree, "default",
        ["data=alt",
         "+run_name=${hydra:runtime.choices.data}-${now:%Y}"],
    )
    year = cfg["run_name"].rsplit("-", 1)[1]
    assert cfg["run_name"].startswith("alt-")
    assert len(year) == 4 and year.isdigit()


def test_tilde_group_with_choice_must_match(tree):
    """Hydra's '~group=choice' delete grammar requires the choice to match
    the one actually selected in the defaults list (like '~key=value' does
    for values)."""
    cfg = compose(tree, "default", ["~data=base"])  # matches defaults
    assert "data" not in cfg
    with pytest.raises(ValueError, match="selected choice"):
        compose(tree, "default", ["~data=alt"])  # defaults select 'base'
    # deleting a real group that is not in the defaults list errors
    write(tree, "extra_del/only.yaml", "k: 1\n")
    with pytest.raises(ValueError, match="not in the defaults list"):
        compose(tree, "default", ["~extra_del=only"])
    # '~notagroup=...' (no such group dir) is a value delete and errors too
    with pytest.raises(KeyError, match="not in config"):
        compose(tree, "default", ["~nope=base"])


def test_plusplus_on_group_errors(tree):
    """Hydra rejects '++' on defaults-list groups — only value keys take the
    add-or-override prefix."""
    with pytest.raises(ValueError, match="config group"):
        compose(tree, "default", ["++data=alt"])


def test_override_through_non_dict_node_errors(tree):
    """Traversing a non-dict intermediate must error, not clobber it with {}
    ('++data.batch_size.x=1' previously replaced the int batch_size)."""
    with pytest.raises(KeyError, match="non-dict"):
        compose(tree, "default", ["++data.batch_size.x=1"])
    with pytest.raises(KeyError, match="non-dict"):
        compose(tree, "default", ["+data.batch_size.x=1"])
    assert compose(tree, "default", [])["data"]["batch_size"] == 16


def test_plus_group_not_in_defaults_composes(tree):
    """'+group=choice' for a group absent from the defaults list adds it
    (Hydra's append-a-group form)."""
    write(tree, "extra_group/only.yaml", "knob: 3\n")
    cfg = compose(tree, "default", ["+extra_group=only"])
    assert cfg["extra_group"]["knob"] == 3
    assert cfg["_choices_"]["extra_group"] == "only"


def test_interpolation_referencing_deleted_key_errors_cleanly(tree):
    """An interpolation pointing at a '~'-deleted key must raise the normal
    does-not-resolve error, not KeyError/traceback."""
    with pytest.raises(ValueError, match="does not resolve"):
        compose(tree, "default", ["~data.path", "+x=${data.path}"])
    with pytest.raises(ValueError, match="does not resolve"):
        compose(tree, "default", ["~data", "+x=${data.batch_size}"])


def test_substituted_results_are_not_reinterpolated(tree):
    """OmegaConf does not re-interpolate substitution output: a referenced
    value holding a literal '${' (via the \\${ escape) embeds as text."""
    write(tree, "data/esc.yaml",
          "batch_size: 8\npath: /a\n"
          'raw: "\\\\${HOME}"\nlabel: "pre-${data.raw}-post"\n')
    cfg = compose(tree, "default", ["data=esc"])
    assert cfg["data"]["raw"] == "${HOME}"
    assert cfg["data"]["label"] == "pre-${HOME}-post"


def test_interpolation_errors_are_clean(tree):
    with pytest.raises(ValueError, match="does not resolve"):
        compose(tree, "default", ["+x=${no.such.key}"])
    with pytest.raises(ValueError, match="unsupported resolver"):
        compose(tree, "default", ["+x=${oc.env:HOME}"])
    with pytest.raises(ValueError, match="cycle"):
        compose(tree, "default", ["+a=${b}", "+b=${a}"])
    with pytest.raises(ValueError, match="container"):
        compose(tree, "default", ["+x=prefix-${data}"])
