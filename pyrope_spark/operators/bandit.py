"""B12/B11 contextual bandit: cache-policy action selection from reward logs.

Reference: ``src/Pyrope.AISidecar/bandit_engine.py:10-87`` — a binary-action
(0 = Normal, 1 = Aggressive) contextual bandit over system metrics
(qps, miss_rate, latency_p99, cpu), epsilon-greedy exploration, and a
reward-to-label reduction (positive reward reinforces the taken action,
negative trains the opposite) feeding an incremental logistic SGD.

Spark-first translation (NOT a sidecar port):
- the decision log is a DataFrame of (features..., action, reward) rows —
  the natural shape on a cluster, where every node appends to one table;
- training is a distributed MLlib ``LogisticRegression`` batch refit over
  the accumulated log (documented deviation: the reference's ``partial_fit``
  per event is replaced by periodic batch retrains — same hypothesis class,
  same labels, better-conditioned optimization);
- the reward reduction is a column expression, so the label derivation runs
  JVM-side over any log size;
- action selection is vectorized: a seeded ``rand()`` column for the
  epsilon exploration branch, a logistic score for exploitation — the whole
  batch decides in one plan (``apply_policy``), or a single decision happens
  driver-side from the tiny coefficient vector (``BanditPolicy.select``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_EPSILON = 0.1  # reference bandit_engine.py:11
BANDIT_FEATURES = ["qps", "miss_rate", "latency_p99_ms", "cpu_utilization"]


@dataclass
class BanditPolicy:
    """Trained artifact: logistic coefficients over the feature columns.
    Action 1 ('Aggressive') is chosen when the predicted success
    probability of it exceeds 0.5 (reference ``predict``)."""

    coefficients: np.ndarray
    intercept: float
    feature_cols: list
    epsilon: float = DEFAULT_EPSILON

    def score(self, features) -> float:
        z = float(np.dot(self.coefficients, np.asarray(features, dtype=np.float64)))
        return 1.0 / (1.0 + np.exp(-(z + self.intercept)))

    def select(self, features, rng: np.random.Generator) -> int:
        """Driver-side single decision (reference select_action): epsilon
        exploration, else argmax action."""
        if rng.random() < self.epsilon:
            return int(rng.integers(0, 2))
        return int(self.score(features) >= 0.5)


def bandit_labels(
    df: DataFrame, *, action_col: str = "action", reward_col: str = "reward"
) -> DataFrame:
    """The reward-to-label reduction (reference update():52-76): positive
    reward -> label = action taken; otherwise -> label = the other action."""
    return df.withColumn(
        "_label",
        F.when(F.col(reward_col) > 0, F.col(action_col)).otherwise(
            F.lit(1) - F.col(action_col)
        ),
    )


def train_bandit(
    log: DataFrame,
    *,
    feature_cols: list | None = None,
    action_col: str = "action",
    reward_col: str = "reward",
    epsilon: float = DEFAULT_EPSILON,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> BanditPolicy:
    """Fit the policy on the accumulated decision log — one distributed
    MLlib job (L2-regularized logistic, mirroring the reference's
    ``SGDClassifier(loss='log_loss', penalty='l2')`` hypothesis class)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feature_cols = list(feature_cols or BANDIT_FEATURES)
    labeled = bandit_labels(log, action_col=action_col, reward_col=reward_col)
    assembled = VectorAssembler(inputCols=feature_cols, outputCol="_features").transform(
        labeled.select(*feature_cols, F.col("_label").cast("double"))
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(assembled)
    return BanditPolicy(
        coefficients=np.asarray(model.coefficients.toArray(), dtype=np.float64),
        intercept=float(model.intercept),
        feature_cols=feature_cols,
        epsilon=epsilon,
    )


def apply_policy(
    metrics: DataFrame,
    policy: BanditPolicy,
    *,
    seed: int = 42,
    out_col: str = "action",
) -> DataFrame:
    """Vectorized batch decision: epsilon-greedy per row with a seeded
    ``rand()`` exploration branch and the logistic exploitation score as
    native expressions — no Python in the loop."""
    z = F.lit(policy.intercept)
    for c, w in zip(policy.feature_cols, policy.coefficients):
        z = z + F.col(c).cast("double") * F.lit(float(w))
    p1 = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    explore = F.rand(seed) < F.lit(policy.epsilon)
    random_action = (F.rand(seed + 1) < 0.5).cast("int")
    exploit_action = (p1 >= 0.5).cast("int")
    return metrics.withColumn(
        out_col, F.when(explore, random_action).otherwise(exploit_action)
    ).withColumn(f"{out_col}_score", p1)
