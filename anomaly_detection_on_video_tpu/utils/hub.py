"""HF-hub weight resolution for the extraction/serving CLIs.

The reference's extraction workflow downloads its I3D weights automatically
from the HF model repo ``jinmang2/test_video_fe`` (reference:
src/i3d.py:12-18,354-359 — ``hf_hub_download`` inside
``build_i3d_feature_extractor``). This module gives the CLIs the same
network mode behind an explicit scheme so the flag stays a plain local path
by default (zero-egress friendly):

    --weights hf://jinmang2/test_video_fe/converted_ref_i3d.pt
    --weights hf://org/repo@revision/sub/dir/file.pt

plus the per-model default artifacts mirroring the reference's weight map
(src/i3d.py:12-18), used when the CLI is already in network mode
(``--hf-dataset``) and no ``--weights`` was given — the reference's exact
no-flag flow.

Downloads go through ``huggingface_hub.hf_hub_download``, so the standard
HF cache and ``HF_HUB_OFFLINE`` behavior apply; on an offline host a cached
file still resolves.
"""

from __future__ import annotations

from typing import Optional, Tuple

# reference src/i3d.py:12-18: model-name -> filename in jinmang2/test_video_fe
WEIGHTS_HUB = "jinmang2/test_video_fe"
DEFAULT_WEIGHT_FILES = {
    "tushar-n-baseline": "converted_ref_i3d.pt",
    "i3d_8x8_r50": "I3D_8x8_R50.pyth",
}

_SCHEME = "hf://"


def is_hub_spec(spec: Optional[str]) -> bool:
    return isinstance(spec, str) and spec.startswith(_SCHEME)


def default_weight_spec(model_name: str) -> str:
    """The reference's automatic weight artifact for ``model_name``.

    Mirrors the ``model_name -> (repo file)`` map the reference downloads
    from (src/i3d.py:12-18,354).
    """
    try:
        filename = DEFAULT_WEIGHT_FILES[model_name]
    except KeyError:
        raise ValueError(
            f"no default hub weights for model {model_name!r} "
            f"(known: {sorted(DEFAULT_WEIGHT_FILES)})"
        ) from None
    return f"{_SCHEME}{WEIGHTS_HUB}/{filename}"


def parse_hub_spec(spec: str) -> Tuple[str, Optional[str], str]:
    """Split ``hf://org/repo[@revision]/path/to/file`` into parts.

    Returns ``(repo_id, revision, filename)``; ``revision`` is ``None``
    when no ``@revision`` suffix is given. HF repo ids are two path
    segments (``org/name``); everything after them is the in-repo
    filename. Limitation: revisions containing ``/`` (e.g. HF PR refs
    like ``refs/pr/1``) cannot be expressed — the grammar cannot tell a
    slashed revision from the filename; use the commit hash instead.
    """
    if not is_hub_spec(spec):
        raise ValueError(f"not an hf:// spec: {spec!r}")
    parts = spec[len(_SCHEME) :].split("/")
    if len(parts) < 3 or not all(parts[:3]):
        raise ValueError(
            f"malformed hub spec {spec!r}: expected "
            "hf://org/repo[@revision]/path/to/file"
        )
    org, repo = parts[0], parts[1]
    revision: Optional[str] = None
    if "@" in repo:
        repo, _, revision = repo.partition("@")
        if not repo or not revision:
            raise ValueError(
                f"malformed hub spec {spec!r}: empty repo or revision "
                "around '@'"
            )
    return f"{org}/{repo}", revision, "/".join(parts[2:])


def resolve_weights(
    spec: Optional[str], cache_dir: Optional[str] = None
) -> Optional[str]:
    """Resolve a ``--weights`` value to a local file path.

    Local paths (and ``None``) pass through untouched; ``hf://`` specs are
    downloaded (or served from the HF cache) and the cached local path is
    returned. Raises ``FileNotFoundError`` with a remediation hint when the
    artifact is neither cached nor downloadable (zero-network host), the
    same error contract as the feature-zip hub path
    (data/features.py:250-270).
    """
    if not is_hub_spec(spec):
        return spec
    repo_id, revision, filename = parse_hub_spec(spec)

    from huggingface_hub import hf_hub_download  # network path, optional

    # every hub failure mode maps to the same FileNotFoundError contract
    # the CLIs wrap: offline/uncached (LocalEntryNotFound), typo'd
    # repo/file/revision (RepositoryNotFound/EntryNotFound/
    # RevisionNotFound), auth walls (GatedRepo), and transport errors
    # (HfHubHTTPError). Guarded end to end: older huggingface_hub versions
    # have no `errors` module at all (exceptions lived in .utils), so the
    # import itself is try/excepted, and each name is getattr-guarded.
    try:
        from huggingface_hub import errors as hub_errors
    except ImportError:  # pre-errors-module versions
        try:
            from huggingface_hub import utils as hub_errors
        except ImportError:
            hub_errors = None
    failure_types = tuple(
        t for t in (
            getattr(hub_errors, name, None)
            for name in (
                "LocalEntryNotFoundError",
                "RepositoryNotFoundError",
                "EntryNotFoundError",
                "RevisionNotFoundError",
                "GatedRepoError",
                "HfHubHTTPError",
            )
        )
        if hub_errors is not None and t is not None
    ) or (FileNotFoundError,)
    try:
        return hf_hub_download(
            repo_id=repo_id,
            filename=filename,
            revision=revision,
            cache_dir=cache_dir,
        )
    except failure_types as exc:
        raise FileNotFoundError(
            f"cannot download {repo_id}/{filename} from the HF hub "
            f"({type(exc).__name__}: no network, not cached, or a bad "
            f"repo/file/revision in {spec!r}). Pass a local file instead, "
            f"e.g. --weights /path/to/{filename.rsplit('/', 1)[-1]}"
        ) from exc
