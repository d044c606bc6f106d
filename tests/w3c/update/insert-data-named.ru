PREFIX : <http://example/>
INSERT DATA { GRAPH <urn:g1> { :s :p :o } }
