PREFIX : <http://example/>
INSERT DATA { :s3 :p :o3 . GRAPH :g1 { :s4 :p :o4 } }
