from .scoring_plan import prepare_transaction_features, score_transactions, train_from_csv  # noqa: F401
