"""Engine configuration.

Mirrors the reference's propagated settings carrier
``preprocess_settings.json`` (written at
``force/force_class_utils.py:107-114``, reloaded at
``pytorch/predict.py:595-604``): all temporal parameters live in one
serializable object that travels with every job and is persisted into the
lineage table for provenance.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """All temporal/rollup parameters of the engine.

    Defaults follow the reference project settings
    (``class_main_2_train.py:21`` INT_DAY=10; nodata -9999 per
    ``force/skel/SAMPLE.prm:105-107``; LINEAR interpolation with
    both-direction edge fill per ``utils/class_run.py:193-194``).
    """

    # --- input decode ---------------------------------------------------
    nodata: int = -9999              # sentinel in token streams -> NULL
    cadence_days: int = 3            # token position k -> day epoch+k*cadence
    epoch_day: int = 0               # day index of token position 0 (1970-01-01)

    # --- gap fill / resample --------------------------------------------
    interpolate: str = "LINEAR"      # LINEAR | LOCF | NOCB | NONE (TSA.prm:218-224)
    int_day: int = 10                # equidistant grid step (TSA.prm:262-264)

    # --- fold cascade ----------------------------------------------------
    fold_stat: str = "AVG"           # FOLD_TYPE (TSA.prm:314-323)

    # --- fixed-length windows --------------------------------------------
    max_seq_length: int = 1098       # years*366 cap (class_main_2_train.py:69)
    pad_value: int = 0               # pad token (pytorch/train.py:300-302)

    # --- physical layout --------------------------------------------------
    salt_buckets: int = 32           # salting width for skewed `source`
    shuffle_partitions: int = 32

    # --- noise filter (TSA.prm:142-154) -----------------------------------
    above_noise: float = 3.0
    below_noise: float = 1.0

    extra: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "EngineConfig":
        return EngineConfig(**json.loads(s))


DEFAULT_CONFIG = EngineConfig()
