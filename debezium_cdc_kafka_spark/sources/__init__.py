"""Source builders: Kafka change streams, derived CDC fixtures, rate sources."""
