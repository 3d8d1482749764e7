"""Sources: the Stripe API abstraction (paginated list scans, point
retrieves) and webhook-event parsing/verification."""
