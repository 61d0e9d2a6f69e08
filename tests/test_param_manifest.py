"""Parameter-tree manifest regression test.

The staged regimen's checkpoints must stay loadable across refactors: any
change to module structure, layer names, or weight shapes silently breaks
`--resume` (and historical checkpoints) even when fresh-init tests pass.
This pins the FULL align-pipeline parameter tree (path -> shape) for the
canonical configuration against a recorded manifest.

If a structural change is INTENTIONAL (a breaking change to checkpoints),
regenerate with:  python tests/test_param_manifest.py --regen
"""
import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "param_manifest_align.json")


def current_manifest():
    from deepsir_tpu.config import Config, DataConfig, ModelConfig
    from deepsir_tpu.models import ForwardOptions, Network
    from deepsir_tpu.training import device_batch

    # the staged-synthetic flagship configuration (scripts/staged_synthetic.sh)
    cfg = Config(pipeline="align",
                 model=ModelConfig(feat_len=3, num_points=1024),
                 data=DataConfig(dataset_type="Synthetic")).resolved()
    model = Network(cfg.model, pipeline="align")
    rng = np.random.default_rng(0)
    arrays = {
        "points_src": rng.normal(size=(1, 1024, 3)).astype(np.float32),
        "points_ref": rng.normal(size=(1, 1024, 3)).astype(np.float32),
        "transform_gt": np.eye(3, 4, dtype=np.float32)[None],
    }
    opts = ForwardOptions(num_iter=1)
    params = jax.eval_shape(
        lambda r, a: model.init(r, device_batch(cfg, a), opts),
        jax.random.PRNGKey(0), arrays)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = list(leaf.shape)
    return out


def test_align_param_tree_matches_recorded_manifest():
    with open(MANIFEST) as f:
        recorded = json.load(f)
    now = current_manifest()
    missing = sorted(set(recorded) - set(now))
    added = sorted(set(now) - set(recorded))
    assert not missing and not added, (
        f"parameter tree changed (breaks checkpoints!): missing={missing} "
        f"added={added}")
    wrong = {k: (recorded[k], now[k]) for k in recorded
             if recorded[k] != now[k]}
    assert not wrong, f"parameter shapes changed (breaks checkpoints!): {wrong}"


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(MANIFEST), exist_ok=True)
        with open(MANIFEST, "w") as f:
            json.dump(current_manifest(), f, indent=1, sort_keys=True)
        print(f"wrote {MANIFEST}")
