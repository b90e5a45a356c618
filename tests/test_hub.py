"""Hub-side weight fetch (utils/hub.py), offline with a stubbed download.

The reference's extraction workflow auto-downloads its I3D weights from
``jinmang2/test_video_fe`` (reference: src/i3d.py:12-18,354-359). These
tests pin the ``hf://`` spec grammar and prove the CLIs' weight loading
needs zero manual file plumbing once a (stubbed) hub exists.
"""

import os
import sys

import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from anomaly_detection_on_video_tpu.utils.hub import (
    default_weight_spec,
    is_hub_spec,
    parse_hub_spec,
    resolve_weights,
)


def test_spec_grammar():
    assert parse_hub_spec("hf://jinmang2/test_video_fe/converted_ref_i3d.pt") == (
        "jinmang2/test_video_fe", None, "converted_ref_i3d.pt"
    )
    assert parse_hub_spec("hf://org/repo@abc123/sub/dir/w.pt") == (
        "org/repo", "abc123", "sub/dir/w.pt"
    )
    for bad in ("hf://", "hf://only", "hf://org/repo", "hf://org/@rev/f",
                "hf://org/repo@/f"):
        with pytest.raises(ValueError, match="spec"):
            parse_hub_spec(bad)
    assert is_hub_spec("hf://a/b/c")
    assert not is_hub_spec("/local/path.pt")
    assert not is_hub_spec(None)


def test_default_weight_specs_mirror_reference():
    """Per-model artifacts from the reference's weight map (src/i3d.py:12-18)."""
    assert default_weight_spec("tushar-n-baseline") == (
        "hf://jinmang2/test_video_fe/converted_ref_i3d.pt"
    )
    assert default_weight_spec("i3d_8x8_r50") == (
        "hf://jinmang2/test_video_fe/I3D_8x8_R50.pyth"
    )
    with pytest.raises(ValueError, match="known"):
        default_weight_spec("nope")


def test_resolve_passthrough_and_stubbed_download(tmp_path, monkeypatch):
    assert resolve_weights(None) is None
    assert resolve_weights("/some/local.pt") == "/some/local.pt"

    import huggingface_hub

    calls = {}

    def fake_download(repo_id, filename, revision=None, cache_dir=None):
        calls.update(repo_id=repo_id, filename=filename, revision=revision,
                     cache_dir=cache_dir)
        return str(tmp_path / "cached.pt")

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)
    out = resolve_weights("hf://org/repo@r1/w.pt", cache_dir="/cache")
    assert out == str(tmp_path / "cached.pt")
    assert calls == {"repo_id": "org/repo", "filename": "w.pt",
                     "revision": "r1", "cache_dir": "/cache"}


def test_resolve_offline_raises_remediation(monkeypatch):
    import huggingface_hub
    from huggingface_hub.errors import LocalEntryNotFoundError

    def fail(**kw):
        raise LocalEntryNotFoundError("offline")

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fail)
    with pytest.raises(FileNotFoundError, match="local file"):
        resolve_weights("hf://org/repo/w.pt")


def test_load_weights_via_stubbed_hub(tmp_path, monkeypatch):
    """extract_features.load_weights (shared by infer.py --i3d-weights)
    resolves an hf:// spec straight to converted flax variables — the
    real-weights parity run needs zero manual file plumbing."""
    from torch_oracles import TorchI3Res50

    import extract_features
    import huggingface_hub

    torch.manual_seed(0)
    local = str(tmp_path / "converted_ref_i3d.pt")
    torch.save(TorchI3Res50().state_dict(), local)

    monkeypatch.setattr(
        huggingface_hub, "hf_hub_download", lambda **kw: local
    )
    variables = extract_features.load_weights(
        "hf://jinmang2/test_video_fe/converted_ref_i3d.pt",
        "tushar-n-baseline",
    )
    assert "params" in variables and "batch_stats" in variables


def test_extract_cli_accepts_hub_spec_and_network_default(tmp_path, monkeypatch):
    """Argparse must not reject hf:// specs as missing files, and network
    mode (--hf-dataset) with no --weights must default to the reference's
    hub artifact instead of random init (src/i3d.py:354-359)."""
    import extract_features

    seen = {}

    def boom(path, model_name, flag="--weights"):
        seen["weights"] = path
        raise SystemExit("stop-after-weights")  # skip the real pipeline

    monkeypatch.setattr(extract_features, "load_weights", boom)
    monkeypatch.setattr(
        extract_features, "find_videos", lambda spec: ["/v/a.avi"]
    )
    with pytest.raises(SystemExit, match="stop-after-weights"):
        extract_features.main([
            "--videos", "/v", "--outdir", str(tmp_path),
            "--weights", "hf://org/repo/w.pt",
        ])
    assert seen["weights"] == "hf://org/repo/w.pt"

    with pytest.raises(SystemExit, match="stop-after-weights"):
        extract_features.main([
            "--hf-dataset", "jinmang2/ucf_crime", "--outdir", str(tmp_path),
        ])
    # the default was filled in before the network path ran
    assert seen["weights"] == (
        "hf://jinmang2/test_video_fe/converted_ref_i3d.pt"
    )


def test_resolve_online_failures_map_to_clean_error(monkeypatch):
    """Typo'd repo/file/revision and auth walls (online failure modes) must
    map to the same FileNotFoundError the CLIs wrap — not escape as raw
    huggingface_hub tracebacks."""
    import huggingface_hub
    from huggingface_hub import errors as hub_errors

    for name in ("RepositoryNotFoundError", "EntryNotFoundError",
                 "RevisionNotFoundError", "GatedRepoError"):
        exc_type = getattr(hub_errors, name, None)
        if exc_type is None:
            continue

        def fail(**kw):
            try:
                raise exc_type("nope")
            except TypeError:  # some hub errors need a response arg
                pytest.skip(f"{name} not constructible standalone")

        monkeypatch.setattr(huggingface_hub, "hf_hub_download", fail)
        with pytest.raises(FileNotFoundError, match="bad repo"):
            resolve_weights("hf://org/nonexistent/w.pt")
