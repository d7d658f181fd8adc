from herald_tpu.parallel.exchange import ExchangeSpec, make_exchange
