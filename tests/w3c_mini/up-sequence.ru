PREFIX : <http://example/>
INSERT DATA { :s3 :p :o3 } ;
DELETE DATA { :s2 :p :o2 }
