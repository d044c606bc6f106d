PREFIX : <http://example/>
INSERT DATA { ?cannot :have :variables }
