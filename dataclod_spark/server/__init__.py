"""PostgreSQL wire-protocol presentation layer (reference: src/server/src/postgres/)."""
