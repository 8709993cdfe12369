"""ML-surface operators (SURVEY §2.10).

The reference's sklearn/statsmodels/CatBoost layer re-expressed Spark-first:

- encoders / imputers / scalers as **pure DataFrame expressions** where the
  math is relational (target encoding, one-hot indicators, mean/mode
  imputation, z-score) — these keep Catalyst in charge and need no fitted
  state object;
- Yeo-Johnson power transform fitted by a **single aggregate pass over a
  λ-grid** (vectorized JVM-side log-likelihoods, driver picks the argmax of
  41 numbers — no per-row Python);
- per-key model fits (SARIMAX-style forecasting) as grouped-map
  ``applyInPandas`` — the canonical pattern for per-ticker statsmodels
  (`src/model/train.py:250-291`);
- gradient-boosted trees via **Spark ML** (`GBTRegressor`), replacing the
  single-node CatBoost/XGBoost path (`src/model/train.py:319-352`).
"""
