"""Decentralised verification network: protocol, neurons, transport, ledger."""
