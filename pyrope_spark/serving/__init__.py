"""Thin online-serving layer over the engine operators (SURVEY §7
decision 4: serving is a facade that calls the same operators the batch
paths use — nothing here re-implements search/storage semantics)."""
