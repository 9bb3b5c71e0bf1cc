"""API adapters that translate foreign query surfaces into DataFrame
plans — the analog of the reference's elasticproxy sitting on top of
its SQL core (/root/reference/elasticproxy/)."""
