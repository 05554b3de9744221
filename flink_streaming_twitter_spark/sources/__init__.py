from .files import load_table, load_tables, stream_from_directory
from .kafka import kafka_tweet_stream, parse_tweets

__all__ = [
    "load_table",
    "load_tables",
    "stream_from_directory",
    "kafka_tweet_stream",
    "parse_tweets",
]
